"""Native C++ loader vs the cv2 reference path: identical batches."""
import numpy as np
import pytest

from selfreconcode_tpu.data import SceneDataset, make_synthetic_scene
from selfreconcode_tpu.data.native_loader import _load_lib


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("nat")
    return make_synthetic_scene(str(root), n_frames=6, H=48, W=48)


def test_native_matches_cv2(scene):
    if _load_lib() is None:
        pytest.skip("native loader not built (make -C native)")
    ds_nat = SceneDataset(scene, conds_lens={}, use_native=True)
    ds_ref = SceneDataset(scene, conds_lens={}, use_native=False)
    assert ds_nat._native is not None
    fids = [0, 3, 5]
    b_nat = ds_nat.batch(fids)
    b_ref = ds_ref.batch(fids)
    np.testing.assert_array_equal(b_nat["mask"], b_ref["mask"])
    np.testing.assert_allclose(b_nat["img"], b_ref["img"], atol=1e-6)


def test_native_repeated_batches_cached(scene):
    if _load_lib() is None:
        pytest.skip("native loader not built")
    ds = SceneDataset(scene, conds_lens={}, use_native=True)
    a = ds.batch([1, 2])
    b = ds.batch([1, 2])
    np.testing.assert_array_equal(a["img"], b["img"])
