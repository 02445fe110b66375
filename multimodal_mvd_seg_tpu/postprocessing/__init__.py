from .remove_connected_components import (
    remove_all_but_largest_component,
    remove_all_but_largest_component_from_segmentation,
    apply_postprocessing, apply_postprocessing_to_folder,
    determine_postprocessing, load_postprocess_save)
