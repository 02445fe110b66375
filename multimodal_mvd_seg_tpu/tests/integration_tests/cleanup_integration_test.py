"""Remove integration-test artifacts (reference
cleanup_integration_test.py)."""

import shutil

from ... import paths
from ...utils.files import isdir, join, subdirs


def cleanup_integration_test():
    for root in (paths.get_raw(), paths.get_preprocessed(),
                 paths.get_results()):
        if not isdir(root):
            continue
        for d in subdirs(root, join=False):
            if any(d.startswith(f"Dataset{i}") for i in
                   (995, 996, 997, 998, 999)):
                shutil.rmtree(join(root, d))
                print(f"removed {join(root, d)}")


if __name__ == "__main__":
    cleanup_integration_test()
