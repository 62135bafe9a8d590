"""config_loose.conf end-to-end (VERDICT r4 next #5).

The loose-cloth config ships byte-identical to the reference
(/root/reference/config_loose.conf, README.md:85) and differs from
config.conf in exactly: 600 epochs, milestones {30,60,240,400}, medium @ 18 /
fine @ 36, camera principal points + T frozen, normal loss disabled (-0.1).
These tests EXECUTE real training steps under it and assert the distinct
knobs: the frozen-camera grad mask (trainer.py stop_gradient gating) and the
normal-loss `>0` weight-sign convention (reference network.py:656-674).
"""
import os.path as osp

import numpy as np
import jax
import pytest

pytestmark = pytest.mark.slow

from selfreconcode_tpu.config import parse_file
from selfreconcode_tpu.engine.trainer import build_synthetic_trainer

CONF = osp.join(osp.dirname(__file__), "..", "configs", "config_loose.conf")


def test_loose_schedule_parses():
    conf = parse_file(CONF)
    assert conf.get_int("train.nepoch") == 600
    assert [int(m) for m in conf.get_list("train.scheduler.milestones")] == \
        [30, 60, 240, 400]
    assert conf.get_int("train.medium.start_epoch") == 18
    assert conf.get_int("train.fine.start_epoch") == 36
    assert not conf.get_bool("train.opt_camera.princeple_points")
    assert not conf.get_bool("train.opt_camera.T")
    assert conf.get_bool("train.opt_camera.focal_length")
    assert conf.get_float("loss_coarse.normal_weight") == -0.1


def test_loose_steps_freeze_camera_and_skip_normal_loss(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("loose"))
    tr, ds = build_synthetic_trainer(root, n_frames=8, H=64, W=64,
                                     conf_name="config_loose.conf")
    tr.mc_cap_floor = 4096
    tr.set_stage("coarse")
    tr.override_stage(sample_pix=64, eik_tmp=256, vcap=4096, fcap=8192,
                      ecap=16384, surf_iters=3)
    assert tr.stage_cfg.opt_cam_focal
    assert not tr.stage_cfg.opt_cam_principal
    assert not tr.stage_cfg.opt_cam_T
    assert tr.stage_cfg.weights.normal_weight == -0.1
    tr.initialize_sdf(30)

    cam0 = jax.device_get(tr.state.bank["camera"])
    infos = []
    for i in range(4):
        fids = np.array([(3 * i) % 8, (3 * i + 1) % 8, (3 * i + 2) % 8])
        info = tr.train_step(fids, ds.batch(fids), 1e-3, jax.random.PRNGKey(i))
        infos.append({k: float(v) for k, v in jax.device_get(info).items()})
    cam1 = jax.device_get(tr.state.bank["camera"])

    # normal loss is gated OFF by the weight-sign convention (-0.1 <= 0)
    assert "normal_loss" not in infos[-1]
    for k, v in infos[-1].items():
        assert np.isfinite(v), (k, v)

    # frozen principal points + T: bit-identical after real optimizer steps
    np.testing.assert_array_equal(cam1["princeple_points"],
                                  cam0["princeple_points"])
    np.testing.assert_array_equal(cam1["world2cam_coord_trans"],
                                  cam0["world2cam_coord_trans"])
    # focal stays learnable (loose config leaves it true) and quat frozen
    assert np.abs(cam1["focal_length"] - cam0["focal_length"]).max() > 0
    np.testing.assert_array_equal(cam1["cam2world_coord_quat"],
                                  cam0["cam2world_coord_quat"])
