from .run_training import run_training, get_trainer_from_args, maybe_load_checkpoint
