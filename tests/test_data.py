"""Data layer tests against a synthetic on-disk NeuMan-layout dataset."""
import os

import numpy as np
import pytest

from hugs_tpu.data import (
    NeumanDataset, read_colmap_scene, get_rotating_camera,
    get_predefined_pose, get_smpl_static_params,
)
from hugs_tpu.utils.ply import save_gaussian_ply, load_gaussian_ply


def write_fake_neuman(root, seq="lab", n_frames=12, w=32, h=24):
    from PIL import Image
    path = os.path.join(root, seq)
    os.makedirs(os.path.join(path, "images"))
    os.makedirs(os.path.join(path, "segmentations"))
    os.makedirs(os.path.join(path, "sparse"))
    os.makedirs(os.path.join(path, "4d_humans"))
    rng = np.random.RandomState(0)

    for i in range(n_frames):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(f"{path}/images/{i:05d}.png")
        msk = np.zeros((h, w), np.uint8)
        msk[8:16, 10:20] = 255
        Image.fromarray(msk).save(f"{path}/segmentations/{i:05d}.png")

    with open(f"{path}/sparse/cameras.txt", "w") as f:
        f.write("# comment\n")
        f.write(f"1 PINHOLE {w} {h} {w*1.2} {h*1.2} {w/2} {h/2}\n")
    with open(f"{path}/sparse/images.txt", "w") as f:
        f.write("# comment\n")
        for i in range(n_frames):
            ang = 0.05 * i
            # simple rotation about y as quaternion
            f.write(f"{i+1} {np.cos(ang/2)} 0 {np.sin(ang/2)} 0 "
                    f"{0.1*i} 0 4 1 {i:05d}.png\n")
            f.write("\n")
    with open(f"{path}/sparse/points3D.txt", "w") as f:
        f.write("# comment\n")
        for i in range(50):
            p = rng.uniform(-1, 1, 3)
            c = rng.randint(0, 255, 3)
            f.write(f"{i} {p[0]} {p[1]} {p[2]+4} {c[0]} {c[1]} {c[2]} 0.5\n")

    np.savez(f"{path}/4d_humans/smpl_optimized_aligned_scale.npz",
             betas=rng.randn(n_frames, 10).astype(np.float32) * 0.1,
             global_orient=rng.randn(n_frames, 3).astype(np.float32) * 0.1,
             body_pose=rng.randn(n_frames, 69).astype(np.float32) * 0.1,
             transl=rng.randn(n_frames, 3).astype(np.float32) * 0.1,
             scale=np.ones(n_frames, np.float32))
    return path


@pytest.fixture(scope="module")
def neuman_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("neuman"))
    write_fake_neuman(root)
    return root


def test_colmap_parse(neuman_root):
    scene = read_colmap_scene(os.path.join(neuman_root, "lab", "sparse"))
    assert len(scene.images) == 12
    assert scene.points.shape == (50, 3)
    assert scene.colors.max() <= 1.0
    assert scene.cameras[1].width == 32
    # R orthonormal
    R = scene.images[3].R
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)


def test_neuman_train_val_split(neuman_root):
    tr = NeumanDataset(neuman_root, "lab", "train")
    va = NeumanDataset(neuman_root, "lab", "val")
    assert len(tr) > 0 and len(va) > 0
    assert len(tr) + 2 * len(va) == 12 or len(tr) > len(va)
    d = tr[0]
    assert d["rgb"].shape == (3, 24, 32)
    assert d["mask"].shape == (24, 32)
    assert d["body_pose"].shape == (69,)
    assert d["bbox"].shape == (4,)
    # bbox covers the painted mask block
    xmin, ymin, xmax, ymax = d["bbox"]
    assert xmin == 8 and xmax == 15 and ymin == 10 and ymax == 19
    assert tr.radius > 0


def test_neuman_anim_split(neuman_root, tmp_path):
    # fake AMASS mocap file at the expected relative path
    amass = tmp_path / "amass"
    os.makedirs(amass / "SFU" / "0008")
    rng = np.random.RandomState(1)
    np.savez(amass / "SFU" / "0008" / "0008_ChaCha001_poses.npz",
             poses=rng.randn(100, 156).astype(np.float32) * 0.1,
             trans=rng.randn(100, 3).astype(np.float32))
    ds = NeumanDataset(neuman_root, "lab", "anim", amass_root=str(amass))
    assert len(ds) == 25  # (0,1000,4) slice of 100 frames
    d = ds[0]
    assert d["manual_rotmat"].shape == (3, 3)
    assert "rgb" not in d
    assert d["body_pose"].shape == (69,)


def test_bg_points(neuman_root):
    ds = NeumanDataset(neuman_root, "lab", "train", add_bg_points=True,
                       num_bg_points=1000)
    pts, cols = ds.init_pcd
    assert pts.shape[0] == 1050


def test_ply_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    n = 17
    data = {
        "xyz": rng.randn(n, 3).astype(np.float32),
        "features_dc": rng.randn(n, 1, 3).astype(np.float32),
        "features_rest": rng.randn(n, 15, 3).astype(np.float32),
        "opacity": rng.randn(n, 1).astype(np.float32),
        "scaling": rng.randn(n, 3).astype(np.float32),
        "rotation": rng.randn(n, 4).astype(np.float32),
    }
    p = str(tmp_path / "test.ply")
    save_gaussian_ply(p, **data)
    out = load_gaussian_ply(p)
    for k in data:
        np.testing.assert_allclose(out[k], data[k], atol=1e-6, err_msg=k)


def test_synthetic_cameras():
    cams = get_rotating_camera(img_size=64, nframes=8, dist=5.0)
    assert len(cams) == 8
    for c in cams:
        cc = np.asarray(c["camera"].center)
        np.testing.assert_allclose(np.linalg.norm(cc), 5.0, atol=1e-4)
    pose = get_predefined_pose("a_pose")
    assert pose.shape == (69,)
    assert abs(float(pose[47]) + 0.8) < 1e-6
    sp = get_smpl_static_params(np.zeros(10), "da_pose")
    assert sp["body_pose"].shape == (69,)


def test_colmap_binary_roundtrip(neuman_root, tmp_path):
    """Binary COLMAP model: write_colmap_bin -> read_colmap_scene parity
    with the ASCII parse of the same scene, through BOTH the native C++
    parser and the pure-Python fallback."""
    from hugs_tpu.data import colmap, native
    txt = read_colmap_scene(os.path.join(neuman_root, "lab", "sparse"))
    bdir = str(tmp_path / "sparse_bin")
    colmap.write_colmap_bin(bdir, txt.cameras, txt.images, txt.points,
                            txt.colors)

    def check(scene):
        assert scene.cameras[1] == txt.cameras[1]
        assert len(scene.images) == len(txt.images)
        for a, b in zip(scene.images, txt.images):
            assert a.name == b.name and a.camera_id == b.camera_id
            np.testing.assert_allclose(a.R, b.R, atol=1e-6)
            np.testing.assert_allclose(a.t, b.t, atol=1e-6)
        np.testing.assert_allclose(scene.points, txt.points, atol=1e-6)
        # colors round-trip through u8 quantization
        np.testing.assert_allclose(scene.colors, txt.colors,
                                   atol=0.5 / 255.0)

    check(read_colmap_scene(bdir))          # native path if available
    if native.native_available():
        # force the pure-Python fallbacks
        assert colmap.read_images_bin.__module__ == "hugs_tpu.data.colmap"
        import unittest.mock as mock
        with mock.patch.object(native, "parse_images_bin",
                               lambda p: None), \
             mock.patch.object(native, "parse_points3d_bin",
                               lambda p: None):
            check(read_colmap_scene(bdir))
        # and check native vs python parser agreement directly
        nat = native.parse_points3d_bin(os.path.join(bdir, "points3D.bin"))
        assert nat is not None
        np.testing.assert_allclose(nat[0], txt.points, atol=1e-6)


def test_colmap_bin_preferred_over_txt(neuman_root, tmp_path):
    """A directory holding both formats parses the binary one."""
    from hugs_tpu.data import colmap
    import shutil
    src = os.path.join(neuman_root, "lab", "sparse")
    both = str(tmp_path / "sparse_both")
    shutil.copytree(src, both)
    txt = read_colmap_scene(src)
    # write a binary model with a DIFFERENT point count to tell them apart
    colmap.write_colmap_bin(both, txt.cameras, txt.images,
                            txt.points[:7], txt.colors[:7])
    scene = read_colmap_scene(both)
    assert scene.points.shape == (7, 3)


def test_colmap_camera_model_edge_cases(tmp_path):
    """Distorted-model handling: warn + drop for mild radial/opencv
    distortion, hard error for distorted fisheye, descriptive error for
    unknown binary model ids (ADVICE r3)."""
    import struct
    import warnings as _warnings
    from hugs_tpu.data import colmap

    # zero-distortion models parse silently
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        c = colmap._make_camera("SIMPLE_RADIAL", 64, 48,
                                [50.0, 32.0, 24.0, 0.0])
        assert c.fx == 50.0 and c.fy == 50.0
        c = colmap._make_camera("OPENCV_FISHEYE", 64, 48,
                                [50.0, 51.0, 32.0, 24.0, 0, 0, 0, 0])
        assert c.fy == 51.0

    # nonzero non-fisheye distortion: warning, coefficients dropped
    with pytest.warns(UserWarning, match="distortion"):
        c = colmap._make_camera("OPENCV", 64, 48,
                                [50.0, 51.0, 32.0, 24.0, 0.1, 0, 0, 0])
    assert c.cx == 32.0

    # nonzero fisheye distortion: rejected
    with pytest.raises(ValueError, match="undistort"):
        colmap._make_camera("OPENCV_FISHEYE", 64, 48,
                            [50.0, 51.0, 32.0, 24.0, 0.3, 0, 0, 0])

    # unknown model id in cameras.bin: descriptive ValueError
    path = str(tmp_path / "cameras.bin")
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 99, 64, 48))
    with pytest.raises(ValueError, match="unsupported camera model id 99"):
        colmap.read_cameras_bin(path)


def test_native_parser_matches_python(neuman_root):
    import os as _os
    from hugs_tpu.data import native, colmap
    if not native.native_available():
        import pytest as _pytest
        _pytest.skip("native lib unavailable")
    sparse = _os.path.join(neuman_root, "lab", "sparse")
    # points
    nat = native.parse_points3d(_os.path.join(sparse, "points3D.txt"))
    assert nat is not None
    # force the python fallback by parsing inline
    pts, cols = [], []
    with open(_os.path.join(sparse, "points3D.txt")) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            parts = line.split()
            pts.append([float(x) for x in parts[1:4]])
            cols.append([float(x) / 255.0 for x in parts[4:7]])
    np.testing.assert_allclose(nat[0], np.asarray(pts, np.float32), atol=1e-6)
    np.testing.assert_allclose(nat[1], np.asarray(cols, np.float32), atol=1e-6)
    # images
    nimg = native.parse_images(_os.path.join(sparse, "images.txt"))
    assert nimg is not None
    quat, trans, cam_ids, names = nimg
    assert len(names) == 12
    assert names[0].endswith(".png")


def test_rotating_camera_look_at():
    """Every azimuth of the orbit keeps the origin centered at depth
    `dist` (regression: the reference's own helper composes rot(-azim)
    position with rot(azim) orientation, putting the subject BEHIND the
    camera for half the orbit — see cameras.py docstring)."""
    import jax.numpy as jnp
    from hugs_tpu.data.cameras import get_rotating_camera
    from hugs_tpu.render.project import project_gaussians

    pts = jnp.zeros((1, 3))
    sc = jnp.full((1, 3), 0.02)
    q = jnp.array([[1.0, 0, 0, 0]])
    op = jnp.array([0.9])
    sh = jnp.zeros((1, 3))
    cams = get_rotating_camera(img_size=(68, 120), fov=0.75, dist=4.2,
                               nframes=9)
    for c in cams:
        pg = project_gaussians(pts, sc, q, op, sh, c["camera"], 120, 68, 0)
        assert bool(pg.mask[0])
        np.testing.assert_allclose(float(pg.depth[0]), 4.2, atol=1e-5)
        np.testing.assert_allclose(np.asarray(pg.mean2d[0]),
                                   [59.5, 33.5], atol=1e-3)


def test_clean_pcd_statistical_outlier_removal(neuman_root):
    """clean_pcd == open3d remove_statistical_outlier(100, 0.5) semantics
    (reference neuman.py:234-244): far-flung points whose mean kNN
    distance exceeds mean + 0.5*std of the population are dropped,
    dense-cluster points survive."""
    from hugs_tpu.data.neuman import remove_statistical_outliers

    rng = np.random.RandomState(0)
    cluster = rng.normal(size=(400, 3)).astype(np.float32) * 0.5
    outliers = np.array([[50.0, 0, 0], [0, -80.0, 0], [0, 0, 120.0]],
                        np.float32)
    pts = np.concatenate([cluster, outliers])
    keep = remove_statistical_outliers(pts, nb_neighbors=100,
                                       std_ratio=0.5)
    assert set(range(400, 403)).isdisjoint(keep)   # outliers dropped
    assert len(keep) > 350                         # cluster survives

    # flag plumbed through the dataset ctor (default off keeps all)
    base = NeumanDataset(neuman_root, "lab", "train")
    cleaned = NeumanDataset(neuman_root, "lab", "train", clean_pcd=True)
    assert cleaned.init_pcd[0].shape[0] <= base.init_pcd[0].shape[0]
    assert cleaned.init_pcd[0].shape[0] > 0


def test_scene_from_ply_roundtrip(tmp_path):
    """3DGS-ecosystem import (reference scene.py:267-308): a SceneGS
    exported with save_gaussian_ply reloads via create_from_ply and
    renders identically to the original."""
    import jax
    import jax.numpy as jnp
    from hugs_tpu.models import scene_gs as sgs
    from hugs_tpu.render import render, make_camera

    rng = np.random.RandomState(3)
    pts = rng.uniform(-1, 1, (96, 3)).astype(np.float32)
    pts[:, 2] += 4.0
    gs = sgs.create_from_pcd(jnp.asarray(pts),
                             jnp.asarray(rng.rand(96, 3), jnp.float32),
                             capacity=128)
    gs = gs._replace(active_sh_degree=jnp.int32(3))
    alive = np.asarray(gs.alive)
    p = str(tmp_path / "scene.ply")
    save_gaussian_ply(p, np.asarray(gs.xyz)[alive],
                      np.asarray(gs.features_dc)[alive],
                      np.asarray(gs.features_rest)[alive],
                      np.asarray(gs.opacity)[alive],
                      np.asarray(gs.scaling)[alive],
                      np.asarray(gs.rotation)[alive])

    gs2 = sgs.create_from_ply(p)
    assert int(np.sum(np.asarray(gs2.alive))) == 96

    cam = make_camera(jnp.eye(3), jnp.zeros(3), 0.9, 0.7)

    def img_of(g):
        o = sgs.scene_forward(g)
        return render(o["xyz"], o["scales"], o["rotq"], o["opacity"],
                      o["shs"], cam, 64, 48, active_sh_degree=3,
                      alive=o["alive"], instance_budget=4096)["render"]

    np.testing.assert_allclose(np.asarray(img_of(gs)),
                               np.asarray(img_of(gs2)), atol=1e-6)
