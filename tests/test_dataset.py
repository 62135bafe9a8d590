import numpy as np
import pytest

from selfreconcode_tpu.data import (
    SceneDataset, RandomSampler, batch_iterator, make_synthetic_scene)


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("scene")
    return make_synthetic_scene(str(root), n_frames=10, H=64, W=64)


def test_scene_load_and_bank(scene):
    ds = SceneDataset(scene, conds_lens={"deformer": 128, "renderer": 256})
    assert ds.frame_num == 10
    assert ds.H == ds.W == 64
    bank = ds.param_bank()
    assert bank["poses"].shape == (10, 24, 3)
    assert bank["cond_deformer"].shape == (10, 128)
    assert bank["cond_renderer"].shape == (10, 256)
    # DCT-subspace init: rank of the cond matrix <= frame_num//5
    r = np.linalg.matrix_rank(bank["cond_deformer"], tol=1e-4)
    assert r <= 10 // 5
    # round trip
    bank["poses"][0, 0, 0] = 9.0
    ds.load_bank(bank)
    assert ds.poses[0, 0, 0] == 9.0


def test_batch_shapes_and_range(scene):
    ds = SceneDataset(scene, conds_lens={})
    b = ds.batch([0, 3])
    assert b["img"].shape == (2, 64, 64, 3)
    assert b["mask"].shape == (2, 64, 64)
    assert b["img"].min() >= -1.0 and b["img"].max() <= 1.0
    assert set(np.unique(b["mask"])) <= {0.0, 1.0}
    assert b["mask"][0].sum() > 50  # the disk is visible


def test_window_indices_clamping(scene):
    ds = SceneDataset(scene, conds_lens={})
    starts, offs = ds.window_indices(np.array([0, 5, 9]), batchsize=6)
    # window fits inside [0, 10); offsets point back at the fid
    assert (starts >= 0).all() and (starts + 6 <= 10).all()
    np.testing.assert_array_equal(starts + offs, [0, 5, 9])
    # centered when possible
    assert starts[1] == 5 - 3


def test_window_indices_segments(scene):
    ds = SceneDataset(scene, conds_lens={})
    ds.video_segmented_index = [5]  # two segments: [0,5), [5,10)
    starts, offs = ds.window_indices(np.array([1, 8]), batchsize=4)
    assert starts[0] >= 0 and starts[0] + 4 <= 5
    assert starts[1] >= 5 and starts[1] + 4 <= 10
    np.testing.assert_array_equal(starts + offs, [1, 8])


def test_sampler_and_iterator(scene):
    ds = SceneDataset(scene, conds_lens={})
    s = RandomSampler(ds.frame_num, 1, shuffle=True, seed=0)
    ids = s.epoch_ids()
    assert sorted(ids.tolist()) == list(range(10))
    batches = list(batch_iterator(ds, s, batch_size=3))
    assert len(batches) == 3  # 10//3 full batches
    for fids, data in batches:
        assert len(fids) == 3
        assert data["img"].shape[0] == 3
