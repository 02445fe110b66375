from .ensemble import ensemble_folders, ensemble_crossvalidations, merge_files
