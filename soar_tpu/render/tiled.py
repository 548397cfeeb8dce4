"""Production tile-binned surfel rasterizer (pure XLA, differentiable).

TPU redesign of the reference CUDA pipeline
(``cuda_rasterizer/rasterizer_impl.cu:188-313``):

- CUB prefix-sum + radix-sort over variable-length (tile, depth) key
  duplicates becomes a STATIC duplication: each surfel emits ``dup_side^2``
  tile slots (surfels overlapping more tiles are footprint-capped), and one
  ``jax.lax.sort`` over (tile_id, depth) pairs orders everything — culled
  surfels route to a sentinel tile that sorts last.
- per-tile ranges come from ``searchsorted`` instead of a boundary kernel
  (``identifyTileRanges``).
- the per-tile sequential blend loop becomes a dense
  [tiles, pixels, max_per_tile] cumulative-product composite
  (:mod:`soar_tpu.render.composite`) — depth-ordered semantics preserved,
  but fully vectorized on the VPU and differentiable by autodiff, replacing
  the 1000-line hand-written ``backward.cu``.

Static capacities (``dup_side``, ``max_per_tile``) replace dynamic allocation;
both are config knobs validated against the per-pixel oracle in tests.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from ..core.camera import Camera
from .block_composite import composite_block
from .composite import composite_weights, finalize, finalize_accum, splat_alpha
from .preprocess import preprocess
from .tilegrid import (
    cdiv as _cdiv,
    depth_bits_for,
    quantize_depth,
    slot_tiles as _slot_tiles,
    tile_ranges,
)
from .tilegrid import untile as _untile
from .types import GaussianInputs, Preprocessed, RasterConfig, RenderOutputs


def bin_and_sort(
    pre: Preprocessed,
    image_size: Tuple[int, int],
    cfg: RasterConfig,
):
    """Duplicate surfels into per-tile slots and depth-sort within tiles.

    Returns ``(sorted surfel indices [M], per-tile start offsets [NT],
    per-tile counts [NT], (ntx, nty), overflow [2])`` — overflow counts
    (dropped-past-K, footprint-capped) for the truncation canaries.
    """
    H, W = image_size
    tile = cfg.tile
    ntx, nty = _cdiv(W, tile), _cdiv(H, tile)
    NT = ntx * nty
    N = pre.xy.shape[0]
    S = cfg.dup_side

    # Tile rect per surfel (``auxiliary.h:53-63`` getRect), clamped to grid.
    x, y = pre.xy[:, 0], pre.xy[:, 1]
    r = pre.radius
    rect_min_x = jnp.clip(jnp.floor((x - r) / tile), 0, ntx).astype(jnp.int32)
    rect_min_y = jnp.clip(jnp.floor((y - r) / tile), 0, nty).astype(jnp.int32)
    rect_max_x = jnp.clip(
        jnp.floor((x + r + tile - 1) / tile), 0, ntx
    ).astype(jnp.int32)
    rect_max_y = jnp.clip(
        jnp.floor((y + r + tile - 1) / tile), 0, nty
    ).astype(jnp.int32)

    # ---- two-tier slot budget (``RasterConfig.dup_side_small/fat_budget``):
    # every surfel gets a small Ss x Ss slot grid; the FIRST fat_budget
    # surfels (in index order) whose rect exceeds it instead get the full
    # S x S grid — any wide surfel past the budget is footprint-capped and
    # fires the ``capped`` canary.  Each surfel's slots come from EXACTLY
    # one tier (fat surfels' small slots are masked), so no tile ever
    # composites a surfel twice.
    Ss = min(cfg.dup_side_small, S)
    B = min(cfg.fat_budget, N)
    two_tier = 0 < B < N and Ss < S
    if two_tier:
        # Exact, scatter-free fat-set selection: the fat tier holds the
        # first B surfels whose rect exceeds the small grid (cumsum picks
        # them; a stable bool argsort lists their indices — batched sorts
        # vmap cleanly where a boolean scatter may not).  Only when MORE
        # than B surfels are wide does one miss the fat tier, and then the
        # ``capped`` canary fires.
        wide = (
            ((rect_max_x - rect_min_x) > Ss)
            | ((rect_max_y - rect_min_y) > Ss)
        ) & pre.valid
        in_fat = wide & (jnp.cumsum(wide) <= B)
        fat_idx = jnp.argsort(~in_fat, stable=True)[:B]
        fat_ok = pre.valid[fat_idx] & in_fat[fat_idx]
    else:
        Ss = S
        fat_idx = None
        in_fat = jnp.ones((N,), bool)

    def slot_tiles(side, mnx, mny, mxx, mxy, ok_row):
        return _slot_tiles(side, mnx, mny, mxx, mxy, ok_row, ntx, NT)

    if two_tier:
        tile_small = slot_tiles(
            Ss, rect_min_x, rect_min_y, rect_max_x, rect_max_y,
            pre.valid & ~in_fat,
        )  # [N, Ss*Ss]
        tile_fat = slot_tiles(
            S,
            rect_min_x[fat_idx],
            rect_min_y[fat_idx],
            rect_max_x[fat_idx],
            rect_max_y[fat_idx],
            fat_ok,
        )  # [B, S*S]
    else:
        tile_fat = slot_tiles(
            S, rect_min_x, rect_min_y, rect_max_x, rect_max_y, pre.valid
        )

    # Pack (tile, depth) into ONE uint32 sort key (``tilegrid.depth_bits_for``
    # rationale) — this sort is the single largest compile-time item in the
    # whole pipeline.
    depth_bits = depth_bits_for(NT)
    depth_key = -pre.depth if cfg.sort_descending else pre.depth
    dq = quantize_depth(depth_key, pre.valid, depth_bits)

    ids = jnp.arange(N, dtype=jnp.int32)
    key_fat = (
        tile_fat.astype(jnp.uint32) << depth_bits
    ) | (dq if not two_tier else dq[fat_idx])[:, None]
    idx_fat = jnp.broadcast_to(
        (ids if not two_tier else fat_idx)[:, None], tile_fat.shape
    )
    if two_tier:
        key_small = (tile_small.astype(jnp.uint32) << depth_bits) | dq[:, None]
        idx_small = jnp.broadcast_to(ids[:, None], tile_small.shape)
        key = jnp.concatenate([key_small.reshape(-1), key_fat.reshape(-1)])
        surfel_idx = jnp.concatenate(
            [idx_small.reshape(-1), idx_fat.reshape(-1)]
        )
    else:
        key = key_fat.reshape(-1)
        surfel_idx = idx_fat.reshape(-1)

    sorted_key, sorted_idx = jax.lax.sort_key_val(key, surfel_idx)
    sorted_tile = (sorted_key >> depth_bits).astype(jnp.int32)
    starts, counts = tile_ranges(sorted_tile, NT)

    # Capacity diagnostics (cheap reductions): splats past max_per_tile are
    # silently dropped by the first-K gather, and surfels touching more than
    # dup_side^2 tiles are footprint-capped — both produce wrong-but-plausible
    # images, so they are surfaced as counters instead of failing silently.
    dropped = jnp.sum(jnp.maximum(counts - cfg.max_per_tile, 0))
    # Footprint-capped: wider than the surfel's own tier's slot grid
    # (leaves visible holes — raise dup_side / fat_budget if nonzero).
    wide_small = (
        ((rect_max_x - rect_min_x) > Ss) | ((rect_max_y - rect_min_y) > Ss)
    )
    wide_fat = (
        ((rect_max_x - rect_min_x) > S) | ((rect_max_y - rect_min_y) > S)
    )
    capped = jnp.sum(
        jnp.where(in_fat, wide_fat, wide_small) & pre.valid
    )
    overflow = jnp.stack([dropped, capped]).astype(jnp.int32)
    return sorted_idx, starts, counts, (ntx, nty), overflow


@partial(
    jax.jit,
    static_argnames=("image_size", "cfg"),
)
def rasterize(
    g: GaussianInputs,
    camera: Camera,
    image_size: Tuple[int, int],
    bg_color: jnp.ndarray,
    cfg: RasterConfig = RasterConfig(),
) -> RenderOutputs:
    """Render one view.  Returns images shaped [H, W, ...]."""
    return _rasterize_core(g, camera, image_size, bg_color, cfg, None)[0]


@partial(jax.jit, static_argnames=("image_size", "cfg"))
def rasterize_with_occ(
    g: GaussianInputs,
    occ_colors: jnp.ndarray,
    camera: Camera,
    image_size: Tuple[int, int],
    bg_color: jnp.ndarray,
    cfg: RasterConfig = RasterConfig(),
) -> Tuple[RenderOutputs, RenderOutputs]:
    """Main pass + front-face-culled occlusion pass sharing one preprocess /
    binning / sort / gather.

    The reference launches two complete CUDA rasterizations per view
    (``renderer/diff_gaussian_rasterizer.py:247-291``); here the occ pass
    reuses the sorted tile lists and only re-composites with (a) the occ
    colors, (b) back-facing splats suppressed — the behavior of
    ``render_front=True`` culling (``forward.cu:287-289``) applied at blend
    time.  Geometry gradients are stopped exactly as the reference detaches
    the occ-pass inputs.
    """
    return _rasterize_core(g, camera, image_size, bg_color, cfg, occ_colors)


@partial(jax.jit, static_argnames=("image_size", "cfg"))
def rasterize_front_back(
    g: GaussianInputs,
    occ_colors: jnp.ndarray,
    camera: Camera,
    image_size: Tuple[int, int],
    bg_color: jnp.ndarray,
    cfg: RasterConfig = RasterConfig(),
) -> Tuple[RenderOutputs, RenderOutputs, RenderOutputs]:
    """Front-surface pass + back-surface pass + occlusion pass, ALL sharing
    one preprocess / binning / sort / gather stage.

    The reference renders the GT normal-front and normal-back supervision
    views as two independent CUDA rasterizations with opposite sort orders
    plus an occlusion pass each (``renderer/diff_gaussian_rasterizer.py:
    247-291``, ``rasterizer_impl.cu:269-289``); since both use the same
    camera and geometry, one ascending sort serves all three composites
    here (the back pass walks each tile's run farthest-first — see
    ``gather`` in ``_rasterize_core``).  Returns (front, back, occ).
    """
    assert not cfg.sort_descending and not cfg.compose_reverse
    (front, back), occ = _rasterize_core(
        g, camera, image_size, bg_color, cfg, occ_colors, also_back=True
    )
    return front, back, occ


def _rasterize_core(
    g: GaussianInputs,
    camera: Camera,
    image_size: Tuple[int, int],
    bg_color: jnp.ndarray,
    cfg: RasterConfig,
    occ_colors,
    also_back: bool = False,
):
    H, W = image_size
    tile = cfg.tile
    K = cfg.max_per_tile

    pre = preprocess(g, camera, image_size, cfg)
    sorted_idx, starts, counts, (ntx, nty), overflow = bin_and_sort(
        pre, image_size, cfg
    )
    NT = ntx * nty
    M = sorted_idx.shape[0]

    # First-K gather per tile: entries are depth-sorted within each tile, so
    # truncation drops the FARTHEST splats — exactly the ones a saturated
    # front-to-back composite ignores (opacity is forced to 1 in SOAR,
    # ``renderer/diff_gaussian_rasterizer.py:259``).
    k_ar = jnp.arange(K, dtype=jnp.int32)
    slot_valid = k_ar[None, :] < jnp.minimum(counts, K)[:, None]

    # Selective-remat boundary (``raster_gather`` policy in the trainer):
    # everything downstream of {gidx, slot_valid, overflow, the packed
    # gather} is cheap per-pixel VPU math, while everything upstream
    # includes the 3M-element sort.  Naming these ~12 MB of per-tile
    # residuals lets ``jax.checkpoint(policy=save_only_these_names(...))``
    # keep them for the backward — which then never re-runs preprocess
    # binning or the sort — while the [tiles, pixels, K] composite buffers
    # (~1 GB/view at 512px) still get rematerialized instead of saved.
    slot_valid = checkpoint_name(slot_valid, "raster_slot_valid")
    overflow = checkpoint_name(overflow, "raster_overflow")

    # ONE wide-row gather instead of ~10 narrow ones: TPU gather cost is per
    # ROW, so packing all per-surfel attributes into one [N, 20+C+?] matrix
    # cuts the gather stage ~10x.
    C_ch = pre.colors.shape[-1]
    packed = jnp.concatenate(
        [
            pre.xy,  # 0:2
            pre.conic,  # 2:5
            pre.opacities[:, None],  # 5:6
            pre.depth[:, None],  # 6:7
            pre.view_dot[:, None],  # 7:8
            pre.jinv,  # 8:18
            pre.normal_view,  # 18:21
            pre.colors,  # 21:21+C
        ],
        axis=-1,
    )
    # Zero the rows of CULLED surfels: a degenerate projection (p_view.z
    # near 0 -> inf/NaN xy/conic) is invalid, but its row is still
    # gatherable as first-K PADDING of a short tile run (entries past
    # ``counts`` clip into neighboring runs), and NaN survives the
    # ``alpha * keep`` masking as NaN*0=NaN — poisoning pixels.  One [N, C]
    # select kills inf/NaN at the source; valid rows are untouched.
    packed = jnp.where(pre.valid[:, None], packed, 0.0)

    def gather(reverse: bool):
        """First-K gather of each tile's depth-ascending run.

        ``reverse=True`` walks the run from its FAR end (offset
        ``count-1-k``): the composite sees splats farthest-first — the
        ``sort_descending`` back-surface semantics — and truncation keeps
        the farthest K, exactly like first-K of a descending sort.  Only
        (near-)equal-depth ties (already permuted by the key quantization)
        can order differently.  This is what lets a back pass share the
        ascending sort of a front pass.
        """
        if reverse:
            off = counts[:, None] - 1 - k_ar[None, :]
        else:
            off = jnp.broadcast_to(k_ar[None, :], (NT, K))
        entry = jnp.clip(starts[:, None] + off, 0, M - 1)  # [NT, K]
        gidx = checkpoint_name(sorted_idx[entry], "raster_gidx")
        return gidx, checkpoint_name(packed[gidx], "raster_gather")

    # Per-tile pixel coordinates [NT, tile*tile, 2].
    tx = (jnp.arange(NT, dtype=jnp.int32) % ntx) * tile
    ty = (jnp.arange(NT, dtype=jnp.int32) // ntx) * tile
    lx = jnp.tile(jnp.arange(tile, dtype=jnp.float32), tile)
    ly = jnp.repeat(jnp.arange(tile, dtype=jnp.float32), tile)
    pixf = jnp.stack(
        [tx[:, None] + lx[None, :], ty[:, None] + ly[None, :]], axis=-1
    )  # [NT, P, 2]

    def untile(img_flat, ch):
        return _untile(img_flat, ch, ntx, nty, tile, H, W)

    bg = jnp.asarray(bg_color)

    # Fused-Pallas composite switch (``RasterConfig.composite``): on TPU the
    # kernels compile natively; anywhere else they run in interpret mode so
    # the CPU test suite exercises the exact same code path.
    pallas_interpret = jax.default_backend() != "tpu"
    # bf16 composite intermediates (None = reference-exact f32); see
    # ``RasterConfig.composite_dtype``.
    cdt = jnp.bfloat16 if cfg.composite_dtype == "bf16" else None

    def composite_main_pallas(g):
        """Fused-kernel variant of ``composite_main``: the whole
        alpha -> exclusion -> weights -> channel-sum chain runs in ONE
        Pallas kernel per block of tiles (custom-VJP backward), so the
        [tiles, pixels, K] intermediates never reach HBM
        (:mod:`soar_tpu.render.block_composite`)."""
        xy = g[..., 0:2]
        conic = g[..., 2:5]
        opac = g[..., 5]
        depths = g[..., 6]
        view_dot_g = g[..., 7]
        jinv = g[..., 8:18]
        normals = g[..., 18:21]
        colors = g[..., 21 : 21 + C_ch]

        if cfg.surface and cfg.perpix_depth:
            # dif_z = dx*e0 + dy*e1 (the linear-in-pixel-offset form of the
            # plane correction; see block_composite docstring).
            e = jnp.stack(
                [
                    jinv[..., 0] * jinv[..., 6] + jinv[..., 2] * jinv[..., 9],
                    jinv[..., 1] * jinv[..., 6] + jinv[..., 3] * jinv[..., 9],
                ],
                axis=-1,
            )
        else:
            e = jnp.zeros_like(xy)
        parts = [colors]
        if cfg.surface:
            parts.append(normals)
        parts.append(depths[..., None])
        attrs = jnp.concatenate(parts, axis=-1)
        accum, corr, t_final = composite_block(
            xy, conic, opac, slot_valid, attrs, e, pixf,
            cfg.alpha_clamp, cfg.alpha_min, cfg.transmittance_min,
            block=cfg.pallas_block,
            interpret=pallas_interpret,
        )
        accum_color = accum[..., :C_ch]
        if cfg.surface:
            accum_normal = accum[..., C_ch : C_ch + 3]
        else:
            accum_normal = jnp.zeros(accum.shape[:-1] + (3,), accum.dtype)
        accum_depth = accum[..., -1] - corr
        color, normal, depth, opac_out, T = finalize_accum(
            accum_color, accum_normal, accum_depth, t_final, bg,
            cfg.normalize_depth,
        )
        out = RenderOutputs(
            color=untile(color, C_ch),
            normal=untile(normal, 3),
            depth=untile(depth[..., None], 1)[..., 0],
            opac=untile(opac_out[..., None], 1)[..., 0],
            transmittance=untile(T[..., None], 1)[..., 0],
            overflow=overflow,
        )
        return out, (xy, conic, opac, view_dot_g)

    def composite_main_xla(g):
        """Full main-pass composite of one gathered slot order.  Returns the
        RenderOutputs plus the (xy, conic, opac, view_dot) slot tensors the
        occlusion pass re-composites from."""
        xy = g[..., 0:2]
        conic = g[..., 2:5]
        opac = g[..., 5]
        depths = g[..., 6]
        view_dot_g = g[..., 7]
        jinv = g[..., 8:18]
        normals = g[..., 18:21]
        colors = g[..., 21 : 21 + C_ch]

        d = xy[:, None, :, :] - pixf[:, :, None, :]  # [NT, P, K, 2]
        alpha = splat_alpha(
            d,
            conic[:, None],
            opac[:, None],
            slot_valid[:, None],
            cfg.alpha_clamp,
            cfg.alpha_min,
        )  # [NT, P, K]
        if cdt is not None:
            # bf16 composite (``RasterConfig.composite_dtype``): the splat
            # set is decided in f32 above; the [NT, P, K] exclusion cumprod
            # + weights ride bf16 and finalize() accumulates channels f32.
            alpha = alpha.astype(cdt)
        weights, t_final = composite_weights(alpha, cfg.transmittance_min)

        if cfg.surface and cfg.perpix_depth:
            # Plane-corrected depth (``forward.cu:555-584``): only the z row
            # of the tangent offset is needed.
            du0 = (
                d[..., 0] * jinv[:, None, :, 0]
                + d[..., 1] * jinv[:, None, :, 1]
            )
            du1 = (
                d[..., 0] * jinv[:, None, :, 2]
                + d[..., 1] * jinv[:, None, :, 3]
            )
            dif_z = du0 * jinv[:, None, :, 6] + du1 * jinv[:, None, :, 9]
            depth_k = depths[:, None, :] - dif_z
        else:
            depth_k = jnp.broadcast_to(
                depths[:, None, :], alpha.shape
            ).astype(alpha.dtype)

        color, normal, depth, opac_out, T = finalize(
            weights,
            t_final,
            jnp.broadcast_to(
                colors.astype(alpha.dtype)[:, None],
                (NT, tile * tile) + colors.shape[1:],
            ),
            jnp.broadcast_to(
                normals.astype(alpha.dtype)[:, None],
                (NT, tile * tile) + normals.shape[1:],
            ),
            depth_k.astype(alpha.dtype),
            bg,
            cfg.surface,
            cfg.normalize_depth,
        )
        out = RenderOutputs(
            color=untile(color, C_ch),
            normal=untile(normal, 3),
            depth=untile(depth[..., None], 1)[..., 0],
            opac=untile(opac_out[..., None], 1)[..., 0],
            transmittance=untile(T[..., None], 1)[..., 0],
            overflow=overflow,
        )
        return out, (xy, conic, opac, view_dot_g)

    composite_main = (
        composite_main_pallas if cfg.composite == "pallas"
        else composite_main_xla
    )

    if also_back:
        gidx, g_f = gather(False)
        main_out, front_slots = composite_main(g_f)
        main_out = main_out._replace(visible=pre.valid)
        _, g_b = gather(True)
        back_out, _ = composite_main(g_b)
        main_ret = (main_out, back_out)
    else:
        gidx, g_f = gather(cfg.compose_reverse)
        main_out, front_slots = composite_main(g_f)
        main_out = main_out._replace(visible=pre.valid)
        if cfg.compose_reverse and occ_colors is not None:
            # The occ pass is always front-to-back ascending
            # (``diff_gaussian_rasterizer.py:281-291``): re-gather forward.
            gidx, g_ff = gather(False)
            front_slots = (
                g_ff[..., 0:2],
                g_ff[..., 2:5],
                g_ff[..., 5],
                g_ff[..., 7],
            )
        main_ret = main_out

    if occ_colors is None:
        return main_ret, None

    # ---- occlusion pass: re-composite with back-facing splats culled and
    # geometry gradients stopped (``diff_gaussian_rasterizer.py:281-291``).
    xy_s, conic_s, opac_s, view_dot_g = front_slots
    sg = jax.lax.stop_gradient
    front = view_dot_g <= -0.01
    occ_g = checkpoint_name(occ_colors[gidx], "raster_occ_gather")
    Cb = occ_colors.shape[-1]
    if cfg.composite == "pallas":
        accum_b, _, t_final_b = composite_block(
            sg(xy_s), sg(conic_s), opac_s, slot_valid & front, occ_g,
            jnp.zeros_like(xy_s), pixf,
            cfg.alpha_clamp, cfg.alpha_min, cfg.transmittance_min,
            block=cfg.pallas_block,
            interpret=pallas_interpret,
        )
        Tb = jnp.minimum(1.0 - 1e-6, t_final_b)
        color_b = accum_b + Tb[..., None] * bg
    else:
        d_b = sg(xy_s)[:, None, :, :] - pixf[:, :, None, :]
        alpha_b = splat_alpha(
            d_b,
            sg(conic_s)[:, None],
            opac_s[:, None],
            (slot_valid & front)[:, None],
            cfg.alpha_clamp,
            cfg.alpha_min,
        )
        if cdt is not None:
            alpha_b = alpha_b.astype(cdt)
        weights_b, t_final_b = composite_weights(
            alpha_b, cfg.transmittance_min
        )
        Tb = jnp.minimum(1.0 - 1e-6, t_final_b.astype(jnp.float32))
        color_b = (
            jnp.einsum("npk,nkc->npc", weights_b,
                       occ_g.astype(alpha_b.dtype),
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
            + Tb[..., None] * bg
        )
    ref_out = main_ret[0] if also_back else main_ret
    occ_out = RenderOutputs(
        color=untile(color_b, Cb),
        normal=ref_out.normal,
        depth=ref_out.depth,
        opac=untile((1.0 - Tb)[..., None], 1)[..., 0],
        transmittance=untile(Tb[..., None], 1)[..., 0],
    )
    return main_ret, occ_out
