from .dataset import (  # noqa: F401
    SceneDataset, RandomSampler, batch_iterator, make_synthetic_scene)
