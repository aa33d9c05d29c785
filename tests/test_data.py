"""Dataset-layer tests: on-disk fixtures written fresh per test."""
import json
import os
import struct

import imageio.v2 as imageio
import numpy as np
import pytest

from nerf_pytorch_paeng_tpu.data import (
    get_render_pose, load_blender, load_llff, pose_spherical)
from nerf_pytorch_paeng_tpu.data.colmap.read_model import (
    qvec2rotmat, read_cameras_binary, read_images_binary,
    read_points3d_binary)
from nerf_pytorch_paeng_tpu.data.llff import (
    minify, poses_avg, recenter_poses, view_matrix)


# -------------------------------------------------------------- blender ----

def write_blender_fixture(root, n_train=3, n_val=1, n_test=2, H=8, W=8):
    rng = np.random.default_rng(0)
    for split, n in (("train", n_train), ("val", n_val), ("test", n_test)):
        frames = []
        os.makedirs(os.path.join(root, split), exist_ok=True)
        for i in range(n):
            img = rng.integers(0, 255, size=(H, W, 4), dtype=np.uint8)
            img[..., 3] = 255  # opaque
            rel = f"{split}/r_{i}"
            imageio.imwrite(os.path.join(root, rel + ".png"), img)
            pose = np.eye(4)
            pose[2, 3] = 4.0 + i
            frames.append({"file_path": rel,
                           "transform_matrix": pose.tolist()})
        meta = {"camera_angle_x": 0.6911112070083618, "frames": frames}
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump(meta, f)


def test_load_blender_splits_and_intrinsics(tmp_path):
    write_blender_fixture(str(tmp_path))
    imgs, (K, ext), (H, W), i_split = load_blender(
        str(tmp_path), bkg_white=True, downsample=0, testskip=1)
    assert imgs.shape == (6, 8, 8, 3)
    assert [len(s) for s in i_split] == [3, 1, 2]
    assert ext.shape == (6, 4, 4)
    want_focal = 0.5 * 8 / np.tan(0.5 * 0.6911112070083618)
    np.testing.assert_allclose(K[0, 0], want_focal, rtol=1e-6)
    np.testing.assert_allclose(K[0, 2], 4.0)
    assert (H, W) == (8, 8)


def test_load_blender_testskip_and_downsample(tmp_path):
    write_blender_fixture(str(tmp_path), n_test=4, H=8, W=8)
    imgs, (K, ext), (H, W), i_split = load_blender(
        str(tmp_path), bkg_white=False, downsample=2, testskip=2)
    assert len(i_split[2]) == 2            # every 2nd test frame
    assert (H, W) == (4, 4)
    assert imgs.shape[1:3] == (4, 4)


def test_blender_alpha_compositing(tmp_path):
    # half-transparent red image: white bkg -> pink; black bkg -> dark red
    root = str(tmp_path)
    for split in ("train", "val", "test"):
        os.makedirs(os.path.join(root, split), exist_ok=True)
        img = np.zeros((4, 4, 4), np.uint8)
        img[..., 0] = 255
        img[..., 3] = 128
        rel = f"{split}/r_0"
        imageio.imwrite(os.path.join(root, rel + ".png"), img)
        meta = {"camera_angle_x": 0.69,
                "frames": [{"file_path": rel,
                            "transform_matrix": np.eye(4).tolist()}]}
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump(meta, f)
    a = 128 / 255.0
    white, _, _, _ = load_blender(root, bkg_white=True, testskip=1)
    np.testing.assert_allclose(white[0, 0, 0],
                               [a + (1 - a), 1 - a, 1 - a], atol=1e-6)
    black, _, _, _ = load_blender(root, bkg_white=False, testskip=1)
    np.testing.assert_allclose(black[0, 0, 0], [a, 0, 0], atol=1e-6)


# ----------------------------------------------------------- render pose ---

def test_pose_spherical_front_view():
    # theta=0, phi=0, r=4: camera at axis-fixed (0,4,0)-ish looking at origin
    p = pose_spherical(0.0, 0.0, 4.0)
    assert p.shape == (4, 4)
    np.testing.assert_allclose(np.asarray(p[:3, 3]), [0, 4, 0], atol=1e-6)
    # rotation part orthonormal
    R = np.asarray(p[:3, :3])
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)


def test_get_render_pose_orbit_count_and_radius():
    poses = get_render_pose(n_angle=40, single_angle=-1, phi=-30.0, nf=4.0)
    assert poses.shape == (40, 4, 4)
    radii = np.linalg.norm(poses[:, :3, 3], axis=-1)
    np.testing.assert_allclose(radii, 4.0, rtol=1e-6)
    single = get_render_pose(n_angle=40, single_angle=120.0, phi=-30.0, nf=4.0)
    assert single.shape == (1, 4, 4)


# -------------------------------------------------------------- colmap -----

def write_colmap_model(sparse0):
    os.makedirs(sparse0, exist_ok=True)
    # cameras.bin: one SIMPLE_PINHOLE camera
    with open(os.path.join(sparse0, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 0, 64, 48))
        f.write(struct.pack("<3d", 50.0, 32.0, 24.0))  # f, cx, cy
    # images.bin: two images with identity-ish rotations
    with open(os.path.join(sparse0, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", 2))
        for i, name in ((1, b"b.png"), (2, b"a.png")):
            f.write(struct.pack("<i", i))
            f.write(struct.pack("<4d", 1.0, 0.0, 0.0, 0.0))  # identity quat
            f.write(struct.pack("<3d", 0.1 * i, 0.0, 1.0))
            f.write(struct.pack("<i", 1))
            f.write(name + b"\x00")
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ddq", 1.0, 2.0, 7))
    # points3D.bin: one point seen by both images
    with open(os.path.join(sparse0, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<Q", 7))
        f.write(struct.pack("<3d", 0.0, 0.0, 5.0))
        f.write(struct.pack("<3B", 255, 0, 0))
        f.write(struct.pack("<d", 0.5))
        f.write(struct.pack("<Q", 2))
        f.write(struct.pack("<ii", 1, 0))
        f.write(struct.pack("<ii", 2, 0))


def test_colmap_binary_parsers(tmp_path):
    sparse0 = str(tmp_path / "sparse" / "0")
    write_colmap_model(sparse0)
    cams = read_cameras_binary(os.path.join(sparse0, "cameras.bin"))
    assert cams[1].model == "SIMPLE_PINHOLE"
    assert cams[1].width == 64 and cams[1].height == 48
    np.testing.assert_allclose(cams[1].params, [50.0, 32.0, 24.0])

    ims = read_images_binary(os.path.join(sparse0, "images.bin"))
    assert {ims[k].name for k in ims} == {"a.png", "b.png"}
    np.testing.assert_allclose(ims[1].qvec, [1, 0, 0, 0])
    np.testing.assert_allclose(ims[2].tvec, [0.2, 0, 1.0])
    assert ims[1].point3D_ids.tolist() == [7]

    pts = read_points3d_binary(os.path.join(sparse0, "points3D.bin"))
    np.testing.assert_allclose(pts[7].xyz, [0, 0, 5.0])
    assert pts[7].image_ids.tolist() == [1, 2]


def write_colmap_model_text(sparse0):
    """The SAME model as write_colmap_model, in COLMAP's text format
    (what `colmap model_converter --output_type TXT` produces)."""
    os.makedirs(sparse0, exist_ok=True)
    with open(os.path.join(sparse0, "cameras.txt"), "w") as f:
        f.write("# Camera list with one line of data per camera:\n")
        f.write("#   CAMERA_ID, MODEL, WIDTH, HEIGHT, PARAMS[]\n")
        f.write("1 SIMPLE_PINHOLE 64 48 50.0 32.0 24.0\n")
    with open(os.path.join(sparse0, "images.txt"), "w") as f:
        f.write("# Image list with two lines of data per image:\n")
        f.write("1 1.0 0.0 0.0 0.0 0.1 0.0 1.0 1 b.png\n")
        f.write("1.0 2.0 7\n")
        f.write("2 1.0 0.0 0.0 0.0 0.2 0.0 1.0 1 a.png\n")
        f.write("1.0 2.0 7\n")
    with open(os.path.join(sparse0, "points3D.txt"), "w") as f:
        f.write("# 3D point list with one line of data per point:\n")
        f.write("7 0.0 0.0 5.0 255 0 0 0.5 1 0 2 0\n")


def test_colmap_text_parsers_match_binary(tmp_path):
    """Text and binary parsers of the same model must agree field-for-field
    (reference colmap_read_model.py:83-261 reads both formats)."""
    from nerf_pytorch_paeng_tpu.data.colmap.read_model import read_model
    bin_dir = str(tmp_path / "bin" / "sparse" / "0")
    txt_dir = str(tmp_path / "txt" / "sparse" / "0")
    write_colmap_model(bin_dir)
    write_colmap_model_text(txt_dir)

    cb, ib, pb = read_model(bin_dir)      # auto-detects .bin
    ct, it, pt = read_model(txt_dir)      # auto-detects .txt
    assert set(cb) == set(ct) and set(ib) == set(it) and set(pb) == set(pt)
    for k in cb:
        assert cb[k].model == ct[k].model
        assert (cb[k].width, cb[k].height) == (ct[k].width, ct[k].height)
        np.testing.assert_allclose(cb[k].params, ct[k].params)
    for k in ib:
        assert ib[k].name == it[k].name
        assert ib[k].camera_id == it[k].camera_id
        np.testing.assert_allclose(ib[k].qvec, it[k].qvec)
        np.testing.assert_allclose(ib[k].tvec, it[k].tvec)
        np.testing.assert_allclose(ib[k].xys, it[k].xys)
        assert ib[k].point3D_ids.tolist() == it[k].point3D_ids.tolist()
    for k in pb:
        np.testing.assert_allclose(pb[k].xyz, pt[k].xyz)
        np.testing.assert_allclose(pb[k].rgb, pt[k].rgb)
        assert pb[k].error == pt[k].error
        assert pb[k].image_ids.tolist() == pt[k].image_ids.tolist()
        assert pb[k].point2D_idxs.tolist() == pt[k].point2D_idxs.tolist()


def test_colmap_images_text_zero_point_image(tmp_path):
    """A registered image with ZERO 2D points writes an EMPTY points line;
    the parser must consume it as that image's record (not skip it and
    desynchronize the header/points alternation for every image after)."""
    from nerf_pytorch_paeng_tpu.data.colmap.read_model import (
        read_images_text)
    p = tmp_path / "images.txt"
    p.write_text(
        "# images\n"
        "1 1.0 0.0 0.0 0.0 0.1 0.0 1.0 1 empty.png\n"
        "\n"                                     # zero-point image
        "2 1.0 0.0 0.0 0.0 0.2 0.0 1.0 1 a b.png\n"  # name with a space
        "1.0 2.0 7 3.0 4.0 -1\n")
    ims = read_images_text(str(p))
    assert set(ims) == {1, 2}
    assert ims[1].name == "empty.png"
    assert ims[1].xys.shape == (0, 2) and ims[1].point3D_ids.shape == (0,)
    assert ims[2].name == "a b.png"
    np.testing.assert_allclose(ims[2].xys, [[1.0, 2.0], [3.0, 4.0]])
    assert ims[2].point3D_ids.tolist() == [7, -1]


def test_colmap_read_model_dispatch_errors(tmp_path):
    from nerf_pytorch_paeng_tpu.data.colmap.read_model import (
        detect_model_ext, read_model)
    with pytest.raises(FileNotFoundError):
        detect_model_ext(str(tmp_path))
    sparse0 = str(tmp_path / "sparse" / "0")
    write_colmap_model_text(sparse0)
    with pytest.raises(ValueError):
        read_model(sparse0, ext=".json")


def test_gen_poses_from_text_model(tmp_path):
    """A dataset shipped with a TEXT sparse model must produce the same
    poses_bounds.npy as the binary one — no COLMAP binary involved."""
    from nerf_pytorch_paeng_tpu.data.colmap.poses import gen_poses
    base_b, base_t = str(tmp_path / "b"), str(tmp_path / "t")
    write_colmap_model(os.path.join(base_b, "sparse", "0"))
    write_colmap_model_text(os.path.join(base_t, "sparse", "0"))
    gen_poses(base_b)
    gen_poses(base_t)
    np.testing.assert_allclose(
        np.load(os.path.join(base_t, "poses_bounds.npy")),
        np.load(os.path.join(base_b, "poses_bounds.npy")), rtol=1e-12)


def test_qvec2rotmat_identity_and_90deg():
    np.testing.assert_allclose(qvec2rotmat(np.array([1.0, 0, 0, 0])),
                               np.eye(3), atol=1e-12)
    # 90° about z: q = (cos45, 0, 0, sin45)
    s = np.sqrt(0.5)
    R = qvec2rotmat(np.array([s, 0, 0, s]))
    np.testing.assert_allclose(R @ np.array([1, 0, 0]), [0, 1, 0], atol=1e-12)


def test_gen_poses_from_model(tmp_path):
    from nerf_pytorch_paeng_tpu.data.colmap.poses import gen_poses
    base = str(tmp_path)
    write_colmap_model(os.path.join(base, "sparse", "0"))
    gen_poses(base)  # model exists -> no colmap binary needed
    arr = np.load(os.path.join(base, "poses_bounds.npy"))
    assert arr.shape == (2, 17)           # 3*5 pose + 2 bounds per image
    # rows sorted by image name: a.png (id 2) first
    pose0 = arr[0, :-2].reshape(3, 5)
    np.testing.assert_allclose(pose0[:, 4], [48, 64, 50.0])  # hwf
    near, far = arr[0, -2:]
    assert 0 < near <= far


# ---------------------------------------------------------------- llff -----

def write_llff_fixture(base, n=6, H=12, W=16, focal=15.0):
    """images/ + a hand-built poses_bounds.npy (cameras on a ring facing
    the origin, LLFF [-u, r, -t] convention pre-load)."""
    os.makedirs(os.path.join(base, "images"), exist_ok=True)
    rng = np.random.default_rng(0)
    rows = []
    for i in range(n):
        img = rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8)
        imageio.imwrite(os.path.join(base, "images", f"{i:03d}.png"), img)
        th = 0.3 * (i - n / 2) / n
        center = np.array([np.sin(th), 0.0, np.cos(th)]) * 0.5
        z = center / np.linalg.norm(center)     # back axis
        up = np.array([0.0, 1.0, 0.0])
        x = np.cross(up, z); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        c2w = np.stack([x, y, z, center], 1)    # [3,4] standard axes
        # invert the loader's axis fix: loader does [r1, -r0, r2-] on rows
        llff_pose = np.concatenate(
            [-c2w[:, 1:2], c2w[:, 0:1], c2w[:, 2:4]], 1)
        hwf = np.array([H, W, focal]).reshape(3, 1)
        rows.append(np.concatenate(
            [np.concatenate([llff_pose, hwf], 1).ravel(),
             np.array([2.0, 8.0])], 0))
    np.save(os.path.join(base, "poses_bounds.npy"), np.array(rows))


def test_load_llff_end_to_end(tmp_path):
    base = str(tmp_path)
    write_llff_fixture(base, n=6)
    images, (K, ext), (H, W), i_split, render_poses = load_llff(
        base, downsample=0, testskip=2)
    assert images.shape[0] == 6 and images.shape[3] == 3
    assert (H, W) == (12, 16)
    assert ext.shape == (6, 3, 4)
    i_train, i_val, i_test = i_split
    assert list(i_test) == [0, 2, 4]
    assert list(i_train) == [1, 3, 5]
    assert render_poses.shape[0] == 120    # spiral path
    # bounds rescale: min bound 2.0 * bd_factor 0.75 -> scale 1/1.5
    # recentred poses: average camera ~ identity
    avg = poses_avg(np.concatenate(
        [ext, np.broadcast_to(np.array([[H], [W], [K[0, 0]]], np.float32),
                              (6, 3, 1))], -1))
    np.testing.assert_allclose(avg[:3, :3], np.eye(3), atol=1e-5)
    np.testing.assert_allclose(avg[:3, 3], 0, atol=1e-5)


def test_load_llff_minify(tmp_path):
    base = str(tmp_path)
    write_llff_fixture(base, n=4, H=12, W=16)
    images, (K, ext), (H, W), _, _ = load_llff(base, downsample=2, testskip=2)
    assert (H, W) == (6, 8)
    assert os.path.isdir(os.path.join(base, "images_2"))
    np.testing.assert_allclose(K[0, 0], 15.0 / 2, rtol=1e-6)


def test_save_as_llff_dataset_roundtrip(tmp_path):
    """The synthetic LLFF writer (utils/synth.save_as_llff_dataset, used
    by tools/run_llff_scale.py) produces a capture the full loader stack
    accepts, with consistent geometry: every pre-load camera looks at the
    blob (the frame contains non-background content) and the loader's
    recenter leaves the average pose at identity."""
    from nerf_pytorch_paeng_tpu.data.llff import poses_avg
    from nerf_pytorch_paeng_tpu.utils.synth import save_as_llff_dataset

    base = str(tmp_path)
    save_as_llff_dataset(base, n_views=6, H=24, W=32, n_samples=64)
    images, (K, ext), (H, W), i_split, render_poses = load_llff(
        base, downsample=0, testskip=4)
    assert images.shape == (6, 24, 32, 3)
    assert (H, W) == (24, 32)
    assert ext.shape == (6, 3, 4)
    assert render_poses.shape == (120, 3, 5)     # spiral path
    i_train, i_val, i_test = i_split
    assert list(i_test) == [0, 4]
    # white background + blob content in every view (look-at geometry)
    nonwhite = (images < 0.95).any(-1).mean(axis=(1, 2))
    assert (nonwhite > 0.2).all() and (nonwhite < 0.95).all()
    assert images.max() > 0.999                  # background present
    # recentered: average pose ~ identity (loader contract)
    hwf = np.broadcast_to(np.array([[H], [W], [K[0, 0]]], np.float32),
                          (6, 3, 1))
    avg = poses_avg(np.concatenate([ext, hwf], -1))
    np.testing.assert_allclose(avg[:3, :3], np.eye(3), atol=1e-5)
    np.testing.assert_allclose(avg[:3, 3], 0, atol=1e-5)


def test_spherify_path():
    from nerf_pytorch_paeng_tpu.data.llff import spherify_poses
    rng = np.random.default_rng(1)
    # cameras on a ring looking inward
    n = 8
    poses = []
    for i in range(n):
        th = 2 * np.pi * i / n
        center = np.array([2 * np.cos(th), 2 * np.sin(th), 0.3])
        z = center / np.linalg.norm(center)
        up = np.array([0, 0, 1.0])
        x = np.cross(up, z); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        hwf = np.array([[8], [8], [10.0]])
        poses.append(np.concatenate([np.stack([x, y, z, center], 1), hwf], 1))
    poses = np.stack(poses).astype(np.float32)
    bds = np.array([[1.0, 5.0]] * n, np.float32)
    p_reset, p_render, bds2 = spherify_poses(poses, bds)
    assert p_render.shape == (120, 3, 5)
    # normalized camera radius ~= 1 after rescale
    np.testing.assert_allclose(
        np.sqrt(np.mean(np.sum(p_reset[:, :3, 3] ** 2, -1))), 1.0, rtol=1e-5)
