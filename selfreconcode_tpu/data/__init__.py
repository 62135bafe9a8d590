from .dataset import (  # noqa: F401
    SceneDataset, RandomSampler, ClipSampler, batch_iterator,
    make_synthetic_scene)
from .synthetic_subject import make_synthetic_subject  # noqa: F401
