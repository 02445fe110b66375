"""Download + install a pretrained model zip by URL.

Parity: reference nnunetv2/model_sharing/model_download.py."""

import os
import tempfile
import urllib.request

from .model_import import install_model_from_zip_file


def download_and_install_from_url(url: str):
    print(f"Downloading {url} ...")
    fd, tmp = tempfile.mkstemp(suffix=".zip")
    os.close(fd)
    try:
        urllib.request.urlretrieve(url, tmp)
        install_model_from_zip_file(tmp)
    finally:
        if os.path.isfile(tmp):
            os.remove(tmp)
