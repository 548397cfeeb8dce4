"""Monocular-video avatar dataset.

Host-side (numpy/cv2) rebuild of ``RandomMultiviewCameraIterableDataset``
(``data/uncond_multiview.py:108-681``): loads all frames / masks / ECON
normal maps into RAM once, applies the deterministic every-5th-frame
train/val/test split, the mask-bbox 512² bilinear crop, and exposes fixed-
shape per-frame GT batches as device arrays.  The per-step random novel-view
cameras live in :mod:`soar_tpu.data.cameras` (drawn with ``jax.random``
inside the jitted step rather than in a CPU dataloader).

On-disk layout (``/data/custom/<seq>/``):
  images/*.png  masks/*.png  normal_F/*.png (RGBA)  normal_B/*.png
  smplx/params.pth  (betas, body_pose, global_orient, transl, hand/face
  poses, expression, Ks, w2c, img_wh, normal_Ks — written by preproc,
  ``preproc/compute_smplx.py:129-135`` / ``compute_normal.py:217-219``)
"""

from __future__ import annotations

import dataclasses
import os
from glob import glob
from typing import Dict, List, Optional, Tuple

import numpy as np


def _imread(path: str, unchanged: bool = True) -> np.ndarray:
    import cv2

    flags = cv2.IMREAD_UNCHANGED if unchanged else cv2.IMREAD_COLOR
    img = cv2.imread(path, flags)
    if img is None:
        raise FileNotFoundError(path)
    return img


def _bgr2rgb(img: np.ndarray) -> np.ndarray:
    return img[..., ::-1].copy()


def split_indices(n: int) -> Tuple[List[int], List[int], List[int]]:
    """Deterministic split (``uncond_multiview.py:137-144``): every-5th-frame
    (offset length//2) held out; first half of the held-out list is test,
    second half val; the rest train."""
    num_val = max(n // 5, 1)
    length = int(1 / num_val * n) if num_val else n
    length = max(length, 1)
    offset = length // 2
    held = list(range(n))[offset::length]
    train = sorted(set(range(n)) - set(held))
    test = held[: len(held) // 2]
    val = held[len(held) // 2 :]
    return train, val, test


def bbox_crop_512(
    img: np.ndarray, mask: np.ndarray, size: int = 512
) -> Tuple[np.ndarray, np.ndarray]:
    """Mask-bbox square crop with 1.1 margin, bilinearly resampled to
    ``size``² — exact grid semantics of the reference's ``F.grid_sample``
    crop (``uncond_multiview.py:246-314``): an endpoint-inclusive linspace
    over the bbox in pixel units, sampled under align_corners=False, which
    in cv2.remap's integer-pixel-centre convention is that same linspace
    shifted by -0.5."""
    import cv2

    ys, xs = np.nonzero(mask)
    if len(xs) == 0:
        return (
            np.zeros((size, size, 3), np.float32),
            np.zeros((size, size), np.float32),
        )
    x0, x1 = xs.min(), xs.max()
    y0, y1 = ys.min(), ys.max()
    cx, cy = (x0 + x1) / 2.0, (y0 + y1) / 2.0
    s = max(x1 - x0, y1 - y0) * 1.1
    H, W = mask.shape
    # Sample positions along the bbox, normalized like the grid_sample call.
    gx = np.linspace(cx - s / 2.0, cx + s / 2.0, size, dtype=np.float32) - 0.5
    gy = np.linspace(cy - s / 2.0, cy + s / 2.0, size, dtype=np.float32) - 0.5
    mx, my = np.meshgrid(gx, gy)
    crop = cv2.remap(
        img.astype(np.float32), mx, my, cv2.INTER_LINEAR, borderValue=0
    )
    mcrop = cv2.remap(
        mask.astype(np.float32), mx, my, cv2.INTER_LINEAR, borderValue=0
    )
    return crop, mcrop


@dataclasses.dataclass
class AvatarDataset:
    """All-in-RAM sequence data (mirrors the reference's preloading)."""

    images: np.ndarray  # [F, H, W, 3] float32 in [0,1], premultiplied by mask
    masks: np.ndarray  # [F, H, W]
    normal_F: np.ndarray  # [F, 512, 512, 3] or empty
    normal_B: np.ndarray  # [F, 512, 512, 3] or empty
    normal_mask: np.ndarray  # [F, 512, 512] or empty
    images_crop: np.ndarray  # [F, 512, 512, 3]
    masks_crop: np.ndarray  # [F, 512, 512]
    smpl_params: Dict[str, np.ndarray]  # per-frame pose params (+betas)
    w2c: np.ndarray  # [4, 4] (already y/z-row flipped, see below)
    Ks: np.ndarray  # [F, 3, 3]
    normal_Ks: np.ndarray  # [F, 3, 3]
    train_idx: List[int]
    val_idx: List[int]
    test_idx: List[int]

    @property
    def num_frames(self) -> int:
        return len(self.images)

    @property
    def image_size(self) -> Tuple[int, int]:
        return self.images.shape[1], self.images.shape[2]

    def gt_c2w(self, frame_idx: int = 0) -> np.ndarray:
        """c2w for a frame; monocular sequences share one extrinsic
        (``w2c`` [4,4]), few-shot synthetic ones have per-view extrinsics
        ([F,4,4], cf. FS dataset ``uncond_multiview.py:1380-1390``)."""
        w2c = self.w2c if self.w2c.ndim == 2 else self.w2c[frame_idx]
        return np.linalg.inv(w2c)

    def frame_fovs(self, idx: int) -> Dict[str, float]:
        H, W = self.image_size
        K = self.Ks[idx]
        nK = self.normal_Ks[idx]
        # Normal-camera fov over the stored normal-map resolution (512 for
        # real data; make_gt_batch sizes the render to the same maps).
        nres = self.normal_F.shape[1] if self.normal_F.size else 512
        return {
            "fovx": 2 * np.arctan(W / (2 * K[0, 0])),
            "fovy": 2 * np.arctan(H / (2 * K[1, 1])),
            "cx": K[0, 2],
            "cy": K[1, 2],
            "normal_fovx": 2 * np.arctan(nres / (2 * nK[0, 0])),
            "normal_fovy": 2 * np.arctan(nres / (2 * nK[1, 1])),
            "normal_cx": nK[0, 2],
            "normal_cy": nK[1, 2],
        }


def _load_params_pth(path: str) -> Dict[str, np.ndarray]:
    """Load the preproc-written torch checkpoint on CPU and convert to numpy
    (torch is host-side IO only; nothing torch touches the TPU path)."""
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    out = {}
    for k, v in data.items():
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().numpy()
        else:
            out[k] = np.asarray(v)
    return out


def load_insav_smpl_params(seq_dir: str) -> Dict[str, np.ndarray]:
    """Load the ``insav_wild`` (GaussianAvatar-style) body parameters:
    ``<seq>/train/smpl_parms.pth`` with keys ``beta`` [1, 10],
    ``body_pose`` [F, 72] (axis-angle, global orient in the first 3), and
    ``trans`` [F, 3] — the SMPL-24 data mode of
    ``utils/smpl.py:182-291`` — remapped to our canonical param dict
    (``global_orient`` split out, ``body_pose`` the remaining 69).

    The reference's UV-posmap side machinery for this mode
    (``load_masks``/``query_posemap``/``lbs_map``, ``utils/smpl.py:62-87``)
    is loaded there but latent: ``query_points`` come from the subdivided
    template and skinning weights from kNN (``:601-637``) exactly like the
    other modes, so this loader is the complete live surface.  Images /
    masks, when present, use the standard ``load_sequence`` layout."""
    path = os.path.join(seq_dir, "train", "smpl_parms.pth")
    if not os.path.exists(path):
        path = os.path.join(seq_dir, "smpl_parms.pth")
    data = _load_params_pth(path)
    full_pose = np.asarray(data["body_pose"], np.float32)
    if full_pose.shape[-1] != 72:
        raise ValueError(
            f"insav_wild body_pose must be [F, 72] (SMPL-24), got "
            f"{full_pose.shape}"
        )
    betas = np.asarray(data["beta"], np.float32).reshape(1, -1)[:, :10]
    return {
        "betas": betas,
        "global_orient": full_pose[:, :3],
        "body_pose": full_pose[:, 3:],
        "transl": np.asarray(data["trans"], np.float32),
    }


def load_sequence(dataroot: str) -> AvatarDataset:
    img_list = sorted(glob(os.path.join(dataroot, "images", "*.png")))
    mask_list = sorted(glob(os.path.join(dataroot, "masks", "*.png")))
    nf_list = sorted(glob(os.path.join(dataroot, "normal_F", "*.png")))
    nb_list = sorted(glob(os.path.join(dataroot, "normal_B", "*.png")))
    if not img_list:
        raise FileNotFoundError(f"no images under {dataroot}/images")

    imgs, masks = [], []
    nfs, nbs, nms = [], [], []
    for i, p in enumerate(img_list):
        img = _imread(p)
        if img.shape[-1] == 4:
            mask = img[..., 3]
            img = img[..., :3]
        else:
            mask = _imread(mask_list[i])
            if mask.ndim == 3:
                mask = mask[..., 0]
        mask = (mask > 0).astype(np.float32)
        img = _bgr2rgb(img).astype(np.float32) / 255.0
        imgs.append(img * mask[..., None])
        masks.append(mask)
        if nf_list:
            nf = _imread(nf_list[i])
            nm = nf[..., 3].astype(np.float32) / 255.0
            nfs.append(_bgr2rgb(nf[..., :3]).astype(np.float32) / 255.0)
            nb = _imread(nb_list[i])
            nbs.append(_bgr2rgb(nb[..., :3]).astype(np.float32) / 255.0)
            nms.append(nm)

    images = np.stack(imgs)
    masks_arr = np.stack(masks)

    params = _load_params_pth(os.path.join(dataroot, "smplx", "params.pth"))
    w2c = np.asarray(params.pop("w2c"), np.float32)
    Ks = np.asarray(params.pop("Ks"), np.float32)
    normal_Ks = np.asarray(params.pop("normal_Ks"), np.float32)
    params.pop("img_wh", None)
    # Flatten rotation-matrix-per-joint poses like the reference
    # (``utils/smpl.py:460-463`` flatten(-2, -1) on axis-angle [F, J, 3]).
    for k in ("body_pose", "left_hand_pose", "right_hand_pose"):
        if k in params and params[k].ndim == 3:
            params[k] = params[k].reshape(params[k].shape[0], -1)

    # The dataset flips rows 1:3 of the w2c before inverting to c2w
    # (``uncond_multiview.py:235``); bake the flip here once.
    w2c = w2c.copy()
    w2c[1:3] *= -1

    crops_i, crops_m = [], []
    for img, mask in zip(images, masks_arr):
        ci, cm = bbox_crop_512(img, mask)
        crops_i.append(ci)
        crops_m.append(cm)

    train, val, test = split_indices(len(images))
    return AvatarDataset(
        images=images,
        masks=masks_arr,
        normal_F=np.stack(nfs) if nfs else np.zeros((0,)),
        normal_B=np.stack(nbs) if nbs else np.zeros((0,)),
        normal_mask=np.stack(nms) if nms else np.zeros((0,)),
        images_crop=np.stack(crops_i),
        masks_crop=np.stack(crops_m),
        smpl_params={k: np.asarray(v, np.float32) for k, v in params.items()},
        w2c=w2c,
        Ks=Ks,
        normal_Ks=normal_Ks,
        train_idx=train,
        val_idx=val,
        test_idx=test,
    )


def circle_poses(
    radius: np.ndarray, theta_deg: np.ndarray, phi_deg: np.ndarray
) -> np.ndarray:
    """Camera-to-world poses on a sphere — the FS dataset camera rig,
    reproduced EXACTLY from ``uncond_multiview.py:2387-2413``.

    Faithful quirk: the reference builds ``right = cross(forward, up)``
    with forward pointing FROM the origin TO the camera, which is the
    NEGATIVE of the proper OpenGL right vector — every frame has det = -1
    (a world x-mirror).  The FS GT images follow this convention, so a
    proper look-at here would render every view horizontally mirrored
    against its GT (left side supervised by the GT's right side)."""
    th = np.deg2rad(theta_deg)
    ph = np.deg2rad(phi_deg)
    pos = np.stack(
        [
            radius * np.sin(th) * np.sin(ph),
            radius * np.cos(th),
            radius * np.sin(th) * np.cos(ph),
        ],
        -1,
    )
    c2ws = []
    for p in pos:
        forward = p / np.linalg.norm(p)  # c2w z-column (camera looks -z)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(forward, up)  # NOTE reference order: improper
        right = right / max(np.linalg.norm(right), 1e-8)
        up2 = np.cross(right, forward)
        up2 = up2 / max(np.linalg.norm(up2), 1e-8)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = np.stack([right, up2, forward], -1)
        c2w[:3, 3] = p
        c2ws.append(c2w)
    return np.stack(c2ws)


def load_fs_sequence(
    dataroot: str,
    radius: float = 3.2,
    theta_deg: float = 90.0,
    fov_deg: float = 20.0,
    train_views: Tuple[int, ...] = (0, 4),
) -> AvatarDataset:
    """Few-shot synthetic ("FS" / xhumans) layout
    (``FSRandomMultiviewCameraIterableDataset``, ``uncond_multiview.py:
    1225-1824``): ``basecolor/ mask/ normal/`` dirs, fixed circle-pose camera
    rig (fov 20°, 1024², per-view extrinsics), world-space normal maps
    rotated into each camera frame, and a HARD-CODED 2-view train split
    ([0, 4], ``:1255``)."""
    img_list = sorted(glob(os.path.join(dataroot, "basecolor", "*.png")))
    mask_list = sorted(glob(os.path.join(dataroot, "mask", "*.png")))
    normal_list = sorted(glob(os.path.join(dataroot, "normal", "*.png")))
    if not img_list:
        raise FileNotFoundError(f"no images under {dataroot}/basecolor")
    F = len(img_list)

    imgs, masks, normals, nmasks = [], [], [], []
    for i in range(F):
        img = _imread(img_list[i])
        if img.shape[-1] == 4:
            mask = (img[..., 3] > 0).astype(np.float32)
            img = img[..., :3]
        else:
            m = _imread(mask_list[i])
            mask = ((m[..., 0] if m.ndim == 3 else m) > 0).astype(np.float32)
        imgs.append(_bgr2rgb(img).astype(np.float32) / 255.0 * mask[..., None])
        masks.append(mask)
        nrm = _imread(normal_list[i])
        nmask = (
            nrm[..., 3].astype(np.float32) / 255.0 if nrm.shape[-1] == 4 else mask
        )
        normals.append(_bgr2rgb(nrm[..., :3]).astype(np.float32) / 255.0)
        nmasks.append(nmask)

    images = np.stack(imgs)
    H, W = images.shape[1:3]
    # NEGATIVE azimuth steps, matching the reference's rig exactly
    # (``range(0, -360, -45)`` at F=8, ``uncond_multiview.py:1376``) —
    # positive stepping puts every held-out view at the wrong azimuth.
    phis = -np.arange(F) / F * 360.0
    c2w = circle_poses(
        np.full(F, radius), np.full(F, theta_deg), phis
    )
    w2c = np.linalg.inv(c2w).astype(np.float32)

    focal = H / (2 * np.tan(np.deg2rad(fov_deg) / 2))
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], np.float32)
    Ks = np.tile(K[None], (F, 1, 1))
    # The trainer renders normal supervision at 512² (gt_normal_res = 512,
    # ``uncond_multiview.py:1550``), and the maps below are resized onto
    # that grid; the matching camera is Ks scaled by 512/H (the reference's
    # ``intrinsic / 2`` is this same factor hard-assuming 1024² inputs).
    normal_Ks = Ks * (512.0 / H)
    normal_Ks[:, 2, 2] = 1.0

    # Rotate world-space normals into each camera frame (``:1389-1398``).
    nfs = []
    for i in range(F):
        n = normals[i] * 2.0 - 1.0
        nl = n.reshape(-1, 3) @ w2c[i][:3, :3].T
        nl = nl / np.maximum(np.linalg.norm(nl, axis=-1, keepdims=True), 1e-8)
        nl = (nl.reshape(n.shape) + 1.0) / 2.0
        nfs.append(nl * nmasks[i][..., None])

    # Enforce the AvatarDataset [F, 512, 512, 3] normal contract: resize
    # maps stored at another resolution so they align with normal_Ks and
    # the 512² normal render (the reference never resizes and would crash
    # on a non-512 FS normal map).
    if nfs[0].shape[0] != 512:
        import cv2

        nfs = [cv2.resize(n, (512, 512), interpolation=cv2.INTER_LINEAR) for n in nfs]
        nmasks = [
            cv2.resize(m, (512, 512), interpolation=cv2.INTER_LINEAR)
            for m in nmasks
        ]

    smpl_path = os.path.join(dataroot, "smplx", "params.pth")
    smpl_params = (
        _load_params_pth(smpl_path) if os.path.exists(smpl_path) else {}
    )
    for k in ("Ks", "w2c", "normal_Ks", "img_wh"):
        smpl_params.pop(k, None)

    crops_i, crops_m = [], []
    for img, mask in zip(images, np.stack(masks)):
        ci, cm = bbox_crop_512(img, mask)
        crops_i.append(ci)
        crops_m.append(cm)

    all_idx = list(range(F))
    held = [i for i in all_idx if i not in train_views]
    return AvatarDataset(
        images=images,
        masks=np.stack(masks),
        normal_F=np.stack(nfs),
        # FS ships no back normals: reference FS sets gt_normal_B = None
        # and the _fs configs zero lambda_normal_B. An empty array (not
        # zeros) marks them absent so nothing ever supervises against a
        # fabricated constant direction.
        normal_B=np.zeros((F, 0, 0, 3), np.float32),
        normal_mask=np.stack(nmasks),
        images_crop=np.stack(crops_i),
        masks_crop=np.stack(crops_m),
        smpl_params={k: np.asarray(v, np.float32) for k, v in smpl_params.items()},
        w2c=w2c,
        Ks=Ks,
        normal_Ks=normal_Ks,
        train_idx=list(train_views),
        val_idx=held[len(held) // 2 :],
        test_idx=held[: len(held) // 2],
    )


def make_synthetic_sequence(
    num_frames: int = 6,
    image_size: Tuple[int, int] = (96, 96),
    seed: int = 0,
) -> Tuple[AvatarDataset, "object"]:
    """Self-contained synthetic sequence rendered from the procedural test
    body with a known surfel coloring — the fixture for end-to-end training
    tests (the reference has no such fixture; SURVEY §4)."""
    import jax
    import jax.numpy as jnp

    from ..avatar import RenderSettings, init_avatar, render_view
    from ..avatar import state as S
    from ..body import make_test_body
    from ..core.camera import camera_from_c2w
    from ..field.attribute_field import AttributeFieldConfig
    from ..field.hashgrid import HashGridConfig
    from ..render.types import RasterConfig

    rng = np.random.RandomState(seed)
    body = make_test_body(num_joints=4, segments_per_bone=3, ring=8)
    F = num_frames
    smpl_params = {
        "betas": np.zeros((1, body.num_betas), np.float32),
        "body_pose": (rng.randn(F, (body.num_joints - 1) * 3) * 0.08).astype(
            np.float32
        ),
        "global_orient": (rng.randn(F, 3) * 0.05).astype(np.float32),
        # Negative z: with identity extrinsics the (OpenGL-convention) c2w
        # looks down -z, so the avatar sits in front of the camera there.
        "transl": np.tile([[0.0, 0.2, -1.8]], (F, 1)).astype(np.float32),
    }

    field_cfg = AttributeFieldConfig(
        grid=HashGridConfig(num_levels=4, min_res=4, max_res=64, log2_hashmap_size=12),
        hidden_dim=16,
    )
    params, model = init_avatar(
        body, smpl_params, num_subdiv=1, field_cfg=field_cfg, distill_steps=0
    )
    # Ground-truth coloring: position-dependent colors.
    gt_colors = (np.tanh(np.asarray(params.xyz) * 3.0) + 1.0) / 2.0
    params = params._replace(
        colors=jnp.asarray(np.log(gt_colors / (1 - gt_colors + 1e-6) + 1e-6))
    )

    # Fixed camera: identity extrinsics in the SOAR convention; the avatar is
    # placed in front via transl z=-1.8 (convert_pose turns the identity c2w
    # into an OpenCV camera looking down -z_world).
    w2c = np.eye(4, dtype=np.float32)
    H, W = image_size
    focal = 1.2 * max(H, W)
    K = np.array(
        [[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], np.float32
    )
    Ks = np.tile(K[None], (F, 1, 1))

    settings = RenderSettings(
        use_explicit=True, raster=RasterConfig(max_per_tile=64, dup_side=3)
    )
    fovx = 2 * np.arctan(W / (2 * focal))
    fovy = 2 * np.arctan(H / (2 * focal))
    c2w = jnp.asarray(np.linalg.inv(w2c))
    cam = camera_from_c2w(
        c2w,
        jnp.asarray(fovx),
        jnp.asarray(fovy),
        prcppoint=jnp.array([0.5, 0.5]),
    )

    imgs, msks = [], []
    for f in range(F):
        out = render_view(
            params, model, cam, (H, W), jnp.zeros(3), jnp.array(f), settings
        )
        imgs.append(np.asarray(out["render"]))
        msks.append((np.asarray(out["mask"]) > 0.5).astype(np.float32))
    images = np.stack(imgs)
    masks = np.stack(msks)
    images = images * masks[..., None]

    crops_i, crops_m = [], []
    for img, mask in zip(images, masks):
        ci, cm = bbox_crop_512(img, mask, size=64)
        crops_i.append(ci)
        crops_m.append(cm)

    train, val, test = split_indices(F)
    ds = AvatarDataset(
        images=images,
        masks=masks,
        normal_F=np.zeros((0,)),
        normal_B=np.zeros((0,)),
        normal_mask=np.zeros((0,)),
        images_crop=np.stack(crops_i),
        masks_crop=np.stack(crops_m),
        smpl_params=smpl_params,
        w2c=w2c,
        Ks=Ks,
        normal_Ks=Ks.copy(),
        train_idx=train,
        val_idx=val,
        test_idx=test,
    )
    return ds, (params, model)
