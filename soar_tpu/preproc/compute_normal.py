"""Clothed-normal-map CLI (``preproc/compute_normal.py`` parity).

Per frame: mask-bbox 512² crop (with the K transformed into crop space),
render the fitted SMPL-X template's front/back normals through
:mod:`soar_tpu.render.mesh_raster` (back = projection z-row flip,
``compute_normal.py:176``), run ECON's NormalNet to predict clothed normals,
write RGBA pngs and append ``normal_Ks`` into ``smplx/params.pth``.

Without ECON weights (``--econ-ckpt``), ``--fallback template`` writes the
rendered template normals directly so the training pipeline still runs; the
flax NormalNet (:mod:`soar_tpu.preproc.normal_net`) is used when weights are
supplied.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
from glob import glob

import numpy as np


def transform_K_by_bbox(K: np.ndarray, bbox, crop_wh) -> np.ndarray:
    """Intrinsics for a square crop resampled to crop_wh
    (``preproc/utils.py`` helper usage at ``compute_normal.py:155``).

    Half-pixel (align_corners=False) convention, the exact inverse of
    :func:`crop_grid`: crop pixel centre ``u`` samples the source at
    ``x0 + (u + 0.5)/sx - 0.5``, so a 3-D point projecting to source
    coordinate ``u_src`` lands on crop coordinate
    ``(u_src - x0 + 0.5) * sx - 0.5``. Keeping the two consistent is what
    aligns the cropped image with the template normals rendered under the
    returned K (a ``linspace(x0, x1, 512)`` grid drifts ~1 px by the
    right/bottom edge)."""
    x0, y0, x1, y1 = [float(v) for v in bbox]
    sx = crop_wh[0] / (x1 - x0)
    sy = crop_wh[1] / (y1 - y0)
    out = K.copy()
    out[0, 0] *= sx
    out[1, 1] *= sy
    out[0, 2] = (K[0, 2] - x0 + 0.5) * sx - 0.5
    out[1, 2] = (K[1, 2] - y0 + 0.5) * sy - 0.5
    return out


def crop_grid(bbox, crop_wh):
    """Source-coordinate sampling grids for the crop, consistent with
    :func:`transform_K_by_bbox` (half-pixel convention)."""
    x0, y0, x1, y1 = [float(v) for v in bbox]
    gx = (
        x0
        + (np.arange(crop_wh[0], dtype=np.float32) + 0.5) * (x1 - x0) / crop_wh[0]
        - 0.5
    )
    gy = (
        y0
        + (np.arange(crop_wh[1], dtype=np.float32) + 0.5) * (y1 - y0) / crop_wh[1]
        - 0.5
    )
    return np.meshgrid(gx, gy)


def mask_bbox(mask: np.ndarray, margin: float = 1.1):
    ys, xs = np.nonzero(mask)
    cx, cy = (xs.min() + xs.max()) / 2.0, (ys.min() + ys.max()) / 2.0
    s = max(xs.max() - xs.min(), ys.max() - ys.min()) * margin
    return (cx - s / 2, cy - s / 2, cx + s / 2, cy + s / 2)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--smpl-model", required=True)
    ap.add_argument("--econ-ckpt", default=None)
    ap.add_argument(
        "--fallback", default="template", choices=["template", "error"]
    )
    args = ap.parse_args(argv)

    import cv2
    import jax.numpy as jnp
    import torch

    from ..body.model import load_smplx_npz, smplx_forward
    from ..render.mesh_raster import get_proj_mat, render_mesh

    img_dir = osp.join(args.data_dir, "images")
    mask_dir = osp.join(args.data_dir, "masks")
    nf_dir = osp.join(args.data_dir, "normal_F")
    nb_dir = osp.join(args.data_dir, "normal_B")
    param_path = osp.join(args.data_dir, "smplx", "params.pth")
    img_paths = sorted(glob(osp.join(img_dir, "*.png")))

    if (
        osp.exists(nf_dir)
        and len(os.listdir(nf_dir)) >= len(img_paths)
        and osp.exists(nb_dir)
    ):
        print("Normals already computed.")
        return
    os.makedirs(nf_dir, exist_ok=True)
    os.makedirs(nb_dir, exist_ok=True)

    params = torch.load(param_path, map_location="cpu", weights_only=False)
    np_params = {
        k: v.numpy() if hasattr(v, "numpy") else v for k, v in params.items()
    }
    body = load_smplx_npz(args.smpl_model)
    smpl_in = {
        k: jnp.asarray(v.reshape(v.shape[0], -1) if v.ndim == 3 else v)
        for k, v in np_params.items()
        if k not in ("Ks", "w2c", "img_wh")
    }
    body_out = smplx_forward(body, smpl_in)
    verts_all = np.asarray(body_out.vertices)

    normal_model = None
    if args.econ_ckpt:
        from .normal_net import NormalNet, convert_normalnet_params

        # Lightning-style ECON checkpoints carry non-tensor objects
        # (hyper_parameters/CfgNode); torch>=2.6 defaults weights_only=True
        # and refuses them.
        sd = torch.load(args.econ_ckpt, map_location="cpu", weights_only=False)
        if "state_dict" in sd:
            sd = sd["state_dict"]
        variables = convert_normalnet_params(sd)
        normal_model = (NormalNet(), variables)
    elif args.fallback == "error":
        raise SystemExit("--econ-ckpt required (ECON normal.ckpt)")

    crop_wh = (512, 512)
    normal_Ks = []
    w2c = jnp.asarray(np_params["w2c"])
    for i, img_path in enumerate(img_paths):
        img = cv2.imread(img_path, cv2.IMREAD_UNCHANGED)
        if img.shape[-1] == 4:
            mask = img[..., 3] > 0
        else:
            mask = cv2.imread(
                osp.join(mask_dir, osp.basename(img_path)), cv2.IMREAD_UNCHANGED
            )
            mask = (mask[..., 0] if mask.ndim == 3 else mask) > 0
        rgb = img[..., :3][..., ::-1].astype(np.float32) / 255.0

        bbox = mask_bbox(mask)
        K_c = transform_K_by_bbox(np_params["Ks"][i], bbox, crop_wh)
        normal_Ks.append(K_c)

        # Crop image+mask to 512² (bilinear remap like F.grid_sample).
        mx, my = crop_grid(bbox, crop_wh)
        crop_img = cv2.remap(rgb, mx, my, cv2.INTER_LINEAR)
        crop_mask = cv2.remap(
            mask.astype(np.float32), mx, my, cv2.INTER_LINEAR
        )

        znear = float(verts_all[i][:, 2].mean() - 3.0)
        proj_f = get_proj_mat(jnp.asarray(K_c), crop_wh, znear=max(znear, 1e-3))
        front = render_mesh(
            jnp.asarray(verts_all[i]), body.faces, w2c, proj_f, crop_wh
        )
        proj_b = np.asarray(proj_f).copy()
        proj_b[2] *= -1.0  # far-surface trick
        back = render_mesh(
            jnp.asarray(verts_all[i]), body.faces, w2c, jnp.asarray(proj_b), crop_wh
        )

        for tag, out in (("front", front), ("back", back)):
            capped = int(np.asarray(out["overflow"])[1])
            if capped:
                print(
                    f"[compute_normal] WARNING frame {i} {tag}: {capped} "
                    "faces exceeded the rasterizer's dup_side tile grid "
                    "(holes possible) — raise render_mesh dup_side"
                )

        t_f = (np.asarray(front["normal"]) * 2 - 1) * np.asarray(front["mask"])
        t_b = (np.asarray(back["normal"]) * 2 - 1) * np.asarray(back["mask"])

        if normal_model is not None:
            net, variables = normal_model
            inp = (crop_img * 2 - 1) * crop_mask[..., None]
            nmlF, nmlB = net.apply(
                variables,
                jnp.asarray(inp)[None],
                jnp.asarray(t_f)[None],
                jnp.asarray(t_b)[None],
            )
            nmlF, nmlB = np.asarray(nmlF[0]), np.asarray(nmlB[0])
        else:
            nmlF, nmlB = t_f, t_b  # template fallback

        for arr, out_dir in ((nmlF, nf_dir), (nmlB, nb_dir)):
            rgba = np.concatenate(
                [
                    ((arr + 1) / 2 * crop_mask[..., None]),
                    crop_mask[..., None],
                ],
                axis=-1,
            )
            cv2.imwrite(
                osp.join(out_dir, f"{i:05d}.png"),
                (np.clip(rgba, 0, 1) * 255).astype(np.uint8)[..., [2, 1, 0, 3]],
            )

    params["normal_Ks"] = torch.from_numpy(
        np.stack(normal_Ks).astype(np.float32)
    )
    torch.save(params, param_path)
    print(f"wrote normals for {len(img_paths)} frames (+normal_Ks)")


if __name__ == "__main__":
    main()
