"""Small file utilities (json, listing, path helpers).

The reference leans on `batchgenerators.utilities.file_and_folder_operations`
for these (subfiles/load_json/save_json/maybe_mkdir_p etc.). We provide our own
equivalents so the framework has no batchgenerators dependency."""

import gzip
import json
import os
import pickle
from typing import List, Optional


def load_json(path: str):
    with open(path) as f:
        return json.load(f)


def save_json(obj, path: str, sort_keys: bool = True, indent: int = 4):
    with open(path, "w") as f:
        json.dump(obj, f, sort_keys=sort_keys, indent=indent, default=_json_default)


def _json_default(o):
    import numpy as np
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    if isinstance(o, (set, tuple)):
        return list(o)
    raise TypeError(f"not JSON serializable: {type(o)}")


def load_pickle(path: str):
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        return pickle.load(f)


def save_pickle(obj, path: str):
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "wb") as f:
        pickle.dump(obj, f)


def maybe_mkdir_p(directory: str):
    os.makedirs(directory, exist_ok=True)


def subfiles(folder: str, join: bool = True, prefix: Optional[str] = None,
             suffix: Optional[str] = None, sort: bool = True) -> List[str]:
    res = [i for i in os.listdir(folder)
           if os.path.isfile(os.path.join(folder, i))
           and (prefix is None or i.startswith(prefix))
           and (suffix is None or i.endswith(suffix))]
    if sort:
        res.sort()
    if join:
        res = [os.path.join(folder, i) for i in res]
    return res


def subdirs(folder: str, join: bool = True, prefix: Optional[str] = None,
            suffix: Optional[str] = None, sort: bool = True) -> List[str]:
    res = [i for i in os.listdir(folder)
           if os.path.isdir(os.path.join(folder, i))
           and (prefix is None or i.startswith(prefix))
           and (suffix is None or i.endswith(suffix))]
    if sort:
        res.sort()
    if join:
        res = [os.path.join(folder, i) for i in res]
    return res


def isfile(p):
    return os.path.isfile(p)


def isdir(p):
    return os.path.isdir(p)


join = os.path.join
