"""Realistic-fidelity subject generator -> SceneDataset round trip."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # renders through the full rasterizer on CPU

from selfreconcode_tpu.data import SceneDataset, make_synthetic_subject


def test_subject_scene_round_trip(tmp_path):
    root = str(tmp_path / "subj")
    make_synthetic_subject(root, n_frames=3, H=96, W=96, n_verts=2000,
                           body_res=40, verbose=False)
    ds = SceneDataset(root, {"deformer": 128, "renderer": 128})
    assert ds.frame_num == 3
    assert ds.H == 96 and ds.W == 96
    assert ds.has_normals
    assert ds.poses.shape == (3, 24, 3)

    d0 = ds.frame_data(0)
    m = d0["mask"]
    # the body is visible and occupies a plausible fraction of the frame
    assert 0.02 < m.mean() < 0.6
    # the image has signal only inside the mask
    img = d0["img"].astype(np.float32)
    assert img[m].mean() > 8.0
    assert img[~m].max() == 0
    # normals decode to ~unit vectors inside the mask
    n = d0["normal"].astype(np.float32)
    ln = np.linalg.norm(n[m], axis=-1)
    assert (np.abs(ln - 1.0) < 0.15).mean() > 0.9
    # camera-frame normals face the camera (+z toward viewer after flip)
    assert (n[m][:, 2] > 0).mean() > 0.8

    # frames differ (the subject rotates)
    d1 = ds.frame_data(2)
    assert (d0["mask"] != d1["mask"]).mean() > 0.005

    # gt mesh for Chamfer eval rides along
    gt = np.load(str(tmp_path / "subj" / "gt_mesh.npz"))
    assert gt["verts"].shape == (2000, 3)
    assert (np.linalg.norm(gt["cloth"], axis=-1).max() < 0.05)


def test_subject_masks_have_no_interior_holes(tmp_path):
    """Round-5 regression: the v1 renderer derived a 64px raster footprint
    from the template's longest edge, overflowed the XLA fallback's default
    cell_cap=48, and silently dropped ~63% of the silhouette as triangle-
    shaped holes — which the r5 acceptance run then trained against.  The
    v2 renderer subdivides the render mesh and ASSERTS zero candidate
    overflow; a generated mask must be a solid silhouette."""
    from scipy.ndimage import binary_fill_holes

    root = str(tmp_path / "subj2")
    make_synthetic_subject(root, n_frames=2, H=128, W=128, n_verts=2000,
                           body_res=40, verbose=False)
    ds = SceneDataset(root, {"deformer": 128, "renderer": 128})
    for fid in range(2):
        m = ds.frame_data(fid)["mask"] > 0
        filled = binary_fill_holes(m)
        holes = (filled ^ m).sum() / max(filled.sum(), 1)
        assert holes < 0.005, f"frame {fid}: {holes:.3f} interior holes"
