from .model_export import export_pretrained_model
from .model_import import install_model_from_zip_file
from .model_download import download_and_install_from_url
from .torch_import import (import_plain_conv_unet,
                           import_torch_model_folder)
