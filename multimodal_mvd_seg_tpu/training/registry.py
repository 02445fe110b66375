"""Trainer registry.

Replaces the reference's filesystem-walking ``recursive_find_python_class``
(utilities/find_class_by_name.py) with an explicit registry; trainers remain
addressable by name from CLIs and checkpoints."""

_TRAINERS = {}


def register_trainer(cls):
    _TRAINERS[cls.__name__] = cls
    return cls


def get_trainer_class(name: str):
    # populate on first use to avoid import cycles
    if not _TRAINERS:
        _populate()
    if name not in _TRAINERS:
        raise RuntimeError(f"Unknown trainer {name!r}; known: "
                           f"{sorted(_TRAINERS)}")
    return _TRAINERS[name]


def available_trainers():
    if not _TRAINERS:
        _populate()
    return sorted(_TRAINERS)


def _populate():
    from .trainer import MVDSegTrainer
    _TRAINERS.setdefault("MVDSegTrainer", MVDSegTrainer)
    _TRAINERS.setdefault("nnUNetTrainer", MVDSegTrainer)
    try:
        from . import variants
        for name in getattr(variants, "__all__", []):
            _TRAINERS.setdefault(name, getattr(variants, name))
    except ImportError:
        pass
    try:
        from .mvd_trainer import ContrastiveTrainer
        _TRAINERS.setdefault("ContrastiveTrainer", ContrastiveTrainer)
        _TRAINERS.setdefault("MVDTrainer", ContrastiveTrainer)
    except ImportError:
        pass
    try:
        from .multitask_trainer import MultiTaskTrainer
        _TRAINERS.setdefault("MultiTaskTrainer", MultiTaskTrainer)
    except ImportError:
        pass
    # the reference variants subclass a module named nnUNetTrainer_semisup
    # that is behaviorally the base trainer (SURVEY.md §0)
    _TRAINERS.setdefault("nnUNetTrainer_semisup", _TRAINERS["MVDSegTrainer"])
