"""Pallas tiled deferred-shading taps: per-image-tile brick DMA + MXU taps.

The camera pass's per-pixel volume taps (shadow transmittance + cone-field
gathers, render/shading.py) are XLA gathers, measured row-bound at ~50M
rows/s regardless of row width (scripts/bench_gather.py) — 2.5 s/frame at
1080p.  This kernel exploits IMAGE-TILE COHERENCE instead: the 256 pixels
of a 16x16 tile hit nearby world positions, so per tile we

  1. pick the finest mip level whose brick covers the tile's tap-point
     AABB (selected in an XLA prepass, shipped as prefetch scalars),
  2. DMA that one brick from HBM,
  3. evaluate every pixel's EXACT trilinear tap as a two-hot-weight matmul
     on the MXU.

MOSAIC DMA CONSTRAINTS shape the brick geometry: a dynamic HBM slice must
be tile-aligned in the last two (tiled) dims — offsets in the sublane dim
must be multiples of the 16-element bf16 tile (asserted via
pl.multiple_of; select_*_bricks genuinely aligns them), and the lane dim
cannot be sliced at runtime at all.  Hence:

  light volume, stored bf16 (D, max(D,32), D):
    brick (16 x, 32 y, D z) — x origin free (leading dim), y origin
    16-aligned (32-extent covers any 16-voxel window), z full extent.
  fused cone field, stored bf16 (D, D, max(D,32), C):
    brick (8 x, 8 y, 32 z, C) — x/y origins free, z origin 16-aligned
    (32-extent covers any 8-voxel window), channels full extent.

bf16 volume storage + bf16 tap matmuls: <=0.4% relative error on [0,1]
transmittance/radiance — below the 8-bit output quantization and below
the reference's GL fixed-point texture-filter fractions.

Quadrilinear semantics vs core/grid.py: within the selected level the tap
is exactly grid.trilinear_sample; tiles whose AABB exceeds a brick at
level 0 sample a coarser level (the same footprint-driven lod selection
the cone march itself uses, fs:96-97) — tests bound the difference.

BOTH basis weightings run in-kernel on the tapped values: the diffuse
cone-weight x spherical-basis contraction (shading.indirect_diffuse_field)
and the specular weighting along the bump-normal reflection axis
(shading.indirect_specular_field) — the reflection itself is formed
in-kernel from the shipped bump normal and camera position, so the kernel
emits final weighted rgba instead of raw per-basis vec4s.

Coarsest levels: light floor is 16 == brick x-extent and field floor is
8 == brick x/y-extent, with the constrained axes zero-padded to the brick
extent — so every tile fits SOME level by construction.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

TILE = 256        # pixels per image tile (16 x 16)
BRICK_L = 16      # light brick x-extent == coarsest light mip dim
LBY = 32          # light brick y-extent (16-aligned origin)
BRICK_F = 8       # field brick x/y-extent == coarsest field mip dim
FBZ = 32          # field brick z-extent (16-aligned origin)
CELLS_F = BRICK_F * BRICK_F * FBZ
ALIGN = 16        # sublane tile for bf16 — aligned-origin granularity
LANE = 128        # lane tile — DMA slices along the lane dim (and the
                  # lane extents of DMA'd arrays) must be multiples of this


# ---------------------------------------------------------------------------
# table packing: pad the constrained axes so aligned bricks always fit
# ---------------------------------------------------------------------------

def _ceil_to(n: int, m: int) -> int:
    return -(-n // m) * m


def pack_light_mips(mips: Sequence[Array]) -> Tuple[Array, ...]:
    """(D, D, D) volumes -> bf16; y zero-padded to >= LBY, z (the lane dim)
    zero-padded to ONE common 128-multiple extent across all levels —
    Mosaic rejects DMA slices whose lane extent is not 128-aligned (and
    every mip chain reaches <128 dims), and a common extent means every
    level's brick DMA writes the full scratch-buffer lane span (no
    lane-sliced destinations at all).  Cheap: the coarse levels are tiny."""
    lzb = max(LANE, _ceil_to(mips[0].shape[2], LANE))
    out = []
    for m in mips:
        dy, dz = m.shape[1], m.shape[2]
        py = max(LBY - dy, 0)
        pz = lzb - dz
        if py or pz:
            m = jnp.pad(m, ((0, 0), (0, py), (0, pz)))
        out.append(m.astype(jnp.bfloat16))
    return tuple(out)


def pack_field_mips(mips: Sequence[Array]) -> Tuple[Array, ...]:
    """(D, D, D, C) fields -> bf16; z zero-padded to >= FBZ, C (the lane
    dim) zero-padded to a multiple of LANE (same Mosaic constraint)."""
    out = []
    for m in mips:
        dz, c = m.shape[2], m.shape[3]
        pz = max(FBZ - dz, 0)
        pc = _ceil_to(c, LANE) - c
        if pz or pc:
            m = jnp.pad(m, ((0, 0), (0, 0), (0, pz), (0, pc)))
        out.append(m.astype(jnp.bfloat16))
    return tuple(out)


# ---------------------------------------------------------------------------
# XLA prepass: per-tile level + brick-origin selection
# ---------------------------------------------------------------------------

def _select(uvw: Array, valid: Array, dims: Sequence[int],
            thresh: Sequence[int], origin_fn) -> Tuple[Array, Array]:
    """Shared level selection: finest level whose per-axis footprint
    (hi - lo, in cells) is within `thresh` (None = axis always fits);
    the coarsest level force-fits (its brick covers the whole mip).

    One masked min/max reduction over the tile's pixels; per-level cell
    bounds derive from the (ntiles, 3) uvw extrema because the
    uvw -> floor(clip(uvw*d - 0.5)) map is monotone — so cost is
    O(pixels) once, not O(pixels x levels)."""
    big = jnp.float32(3e38)
    vm = valid[..., None]
    umin = jnp.min(jnp.where(vm, uvw, big), axis=1)      # (ntiles, 3)
    umax = jnp.max(jnp.where(vm, uvw, -big), axis=1)
    fits, origins = [], []
    for d in dims:
        lo = jnp.floor(jnp.clip(umin * d - 0.5, 0.0, d - 1.0))
        hi = jnp.floor(jnp.clip(umax * d - 0.5, 0.0, d - 1.0))
        ok = jnp.ones(lo.shape[:-1], bool)
        for ax, th in enumerate(thresh):
            if th is not None:
                ok &= (hi[..., ax] - lo[..., ax]) <= th
        fits.append(ok)
        origins.append(origin_fn(lo, d))
    fits = jnp.stack(fits, axis=1)
    fits = fits.at[:, -1].set(True)
    level = jnp.argmax(fits, axis=1).astype(jnp.int32)
    origin = jnp.take_along_axis(
        jnp.stack(origins, axis=1), level[:, None, None], axis=1)[:, 0]
    any_valid = jnp.any(valid, axis=1)
    level = jnp.where(any_valid, level, len(dims) - 1)
    origin = jnp.where(any_valid[:, None], origin, 0)
    return level, origin


def _aligned(lo_ax: Array, d: int, extent: int) -> Array:
    """16-aligned origin whose `extent` window covers [lo, lo+window)."""
    b = jnp.floor(lo_ax / ALIGN) * ALIGN
    return jnp.clip(b, 0, max(d, extent) - extent)


def select_light_bricks(uvw: Array, valid: Array,
                        dims: Sequence[int]) -> Tuple[Array, Array]:
    """Light-volume brick: (x free, y 16-aligned/32-wide, z full).
    Fits when the x/y footprint <= BRICK_L - 2; z always fits."""
    assert dims[-1] == BRICK_L, dims

    def origin(lo, d):
        ox = jnp.clip(lo[..., 0], 0, d - BRICK_L)
        oy = _aligned(lo[..., 1], d, LBY)
        oz = jnp.zeros_like(ox)
        return jnp.stack([ox, oy, oz], axis=-1).astype(jnp.int32)

    return _select(uvw, valid, dims,
                   (BRICK_L - 2, BRICK_L - 2, None), origin)


def select_field_bricks(uvw: Array, valid: Array,
                        dims: Sequence[int]) -> Tuple[Array, Array]:
    """Field brick: (x free, y free, z 16-aligned/32-wide, C full).
    Fits when the x/y footprint <= BRICK_F - 2 and the z footprint <= 15
    (a 16-aligned 32-extent window covers any 15-cell footprint + the
    trilinear corner even when lo % 16 == 15)."""
    assert dims[-1] == BRICK_F, dims

    def origin(lo, d):
        ox = jnp.clip(lo[..., 0], 0, d - BRICK_F)
        oy = jnp.clip(lo[..., 1], 0, d - BRICK_F)
        oz = _aligned(lo[..., 2], d, FBZ)
        return jnp.stack([ox, oy, oz], axis=-1).astype(jnp.int32)

    # z threshold is FBZ - ALIGN - 1 = 15: a 16-aligned origin loses up to
    # ALIGN-1 cells (lo % 16 == 15), and the trilinear +1 corner adds one,
    # so a footprint of 15 exactly fills the 32-cell window; 16 would
    # overflow it by one cell for lo % 16 == 15 (ADVICE r2, high).
    return _select(uvw, valid, dims,
                   (BRICK_F - 2, BRICK_F - 2, FBZ - ALIGN - 1), origin)


# ---------------------------------------------------------------------------
# kernel helpers
# ---------------------------------------------------------------------------

def _axis_twohot(p_ax: Array, origin_ax, dim, world_size: float,
                 brick: int, tile: int) -> Array:
    """One axis's two-hot weights: p_ax (tile, 1) world coords -> (tile,
    brick) f32.  Matches grid.world_to_uvw + the edge-clamped texel-center
    convention of grid.trilinear_sample, rebased to the brick origin."""
    uvw = p_ax / (world_size * 0.5) * 0.5 + 0.5
    t = jnp.clip(uvw * dim - 0.5, 0.0, dim - 1.0) - origin_ax
    i0 = jnp.clip(jnp.floor(t), 0, brick - 2)
    f = jnp.clip(t - i0, 0.0, 1.0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tile, brick), 1)
    i = i0.astype(jnp.int32)
    return (jnp.where(cols == i, 1.0 - f, 0.0)
            + jnp.where(cols == i + 1, f, 0.0))


def _w3(wx: Array, wy: Array, wz: Array, ex, ey, ez) -> Array:
    """Axis two-hots -> (TILE, CELLS_F) trilinear weights, cell index
    j = ((x * BRICK_F) + y) * FBZ + z.  ex/ey/ez are the static
    (axis_extent, CELLS_F) 0/1 expansion matrices."""
    def exp(w, e):
        return jax.lax.dot_general(
            w.astype(jnp.bfloat16), e.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return exp(wx, ex) * exp(wy, ey) * exp(wz, ez)


def expansion_matrices() -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Static 0/1 matrices E[a, j] = 1 iff axis-coord(j) == a, for the
    (BRICK_F, BRICK_F, FBZ) brick flattened x-major."""
    j = np.arange(CELLS_F)
    jx = j // (BRICK_F * FBZ)
    jy = (j // FBZ) % BRICK_F
    jz = j % FBZ
    ax = np.arange(BRICK_F)[:, None]
    az = np.arange(FBZ)[:, None]
    return ((jx[None] == ax).astype(np.float32),
            (jy[None] == ax).astype(np.float32),
            (jz[None] == az).astype(np.float32))


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _tap_kernel(scal_ref,                 # (8, ntiles) int32 prefetch
                gbuf_ref,                 # (tile, >=24) f32
                bn_ref,                   # (tile, 4) f32: bump normal xyz
                cam_ref,                  # (1, 3) f32 camera position
                foldx_ref,                # (BRICK_L*LBY, BRICK_L) static fold
                basis_ref,                # (3, nb) basis directions^T
                sel_ref,                  # (4nb, 4) static fold
                ex_ref, ey_ref, ez_ref,   # expansion matrices
                ed_ref,                   # (nb, 4nb) weight expansion
                cdbd_ref,                 # (9, K*nb) fused cone x basis
                sumk_ref,                 # (K*nb, K) per-cone group sum
                expk_ref,                 # (K, K*nb) per-cone broadcast
                wfold_ref,                # (K*nb, nb) cone-weight fold
                *refs,
                nl: int, nf: int, cfield: int, cpad: int, world_size: float,
                voxel: float, shadow_offset: float,
                light_dims: Tuple[int, ...], light_zs: Tuple[int, ...],
                field_dims: Tuple[int, ...],
                cone_dirs: np.ndarray, cone_weights: np.ndarray,
                nb: int, power_diffuse: int, power_specular: int,
                nout: int, tile: int):
    light_refs = refs[:nl]
    field_refs = refs[nl:nl + nf]
    out_ref = refs[nl + nf]
    lbuf = refs[nl + nf + 1]              # (2, BRICK_L, LBY, LZB) bf16
    fbuf = refs[nl + nf + 2]              # (2, BRICK_F, BRICK_F, FBZ, cpad)
    lsem = refs[nl + nf + 3]
    fsem = refs[nl + nf + 4]
    lzb = light_zs[0]                     # buffer lane extent (128-multiple)

    i = pl.program_id(0)
    n = pl.num_programs(0)

    def light_dma(tile, slot):
        lvl = scal_ref[0, tile]
        ox = scal_ref[1, tile]
        oy = pl.multiple_of(scal_ref[2, tile], ALIGN)
        for li, ref in enumerate(light_refs):
            @pl.when(lvl == li)
            def _():
                # every packed level shares the buffer's z extent, so the
                # destination is the full lane span (no lane slicing)
                pltpu.make_async_copy(
                    ref.at[pl.ds(ox, BRICK_L), pl.ds(oy, LBY), :],
                    lbuf.at[slot], lsem.at[slot]).start()

    def field_dma(tile, slot):
        lvl = scal_ref[4, tile]
        ox, oy = scal_ref[5, tile], scal_ref[6, tile]
        oz = pl.multiple_of(scal_ref[7, tile], ALIGN)
        for fi, ref in enumerate(field_refs):
            @pl.when(lvl == fi)
            def _():
                pltpu.make_async_copy(
                    ref.at[pl.ds(ox, BRICK_F), pl.ds(oy, BRICK_F),
                           pl.ds(oz, FBZ), :],
                    fbuf.at[slot], fsem.at[slot]).start()

    @pl.when(i == 0)
    def _():
        # coarse levels only fill z < dl; zero once so stale lanes (which
        # could be NaN garbage at startup) meet zero weights as 0 * finite
        lbuf[...] = jnp.zeros(lbuf.shape, lbuf.dtype)
        light_dma(0, 0)
        field_dma(0, 0)

    @pl.when(i + 1 < n)
    def _():
        light_dma(i + 1, (i + 1) % 2)
        field_dma(i + 1, (i + 1) % 2)

    slot = i % 2
    pltpu.make_async_copy(lbuf.at[slot], lbuf.at[slot], lsem.at[slot]).wait()
    pltpu.make_async_copy(fbuf.at[slot], fbuf.at[slot], fsem.at[slot]).wait()

    g = gbuf_ref[...]
    pos = g[:, 0:3]
    normal = g[:, 3:6]
    geo_n = g[:, 6:9]
    tangent = g[:, 9:12]
    bitan = g[:, 12:15]

    # ---- shadow tap (shading.shadow_volume_tap) ----
    ldim = (jnp.float32(light_dims[0])
            / jnp.exp2(scal_ref[0, i].astype(jnp.float32)))
    p_light = pos + geo_n * (voxel * shadow_offset)
    lwx = _axis_twohot(p_light[:, 0:1], scal_ref[1, i].astype(jnp.float32),
                       ldim, world_size, BRICK_L, tile)
    lwy = _axis_twohot(p_light[:, 1:2], scal_ref[2, i].astype(jnp.float32),
                       ldim, world_size, LBY, tile)
    lwz = _axis_twohot(p_light[:, 2:3], jnp.float32(0.0),
                       ldim, world_size, lzb, tile)
    # separable contraction: (x, y, z) brick -> (xy, z) 2-D (leading-dim
    # reshape, lane dim intact), z via MXU, y via static fold matrix
    b2 = lbuf[slot].reshape(BRICK_L * LBY, lzb)          # (512, z) bf16
    tz = jax.lax.dot_general(
        lwz.astype(jnp.bfloat16), b2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (tile, xy)
    txy = tz * jnp.tile(lwy, (1, BRICK_L))               # weight by wy[y]
    tx = jax.lax.dot_general(
        txy, foldx_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (tile, x)
    shadow = jnp.sum(tx * lwx, axis=1, keepdims=True)    # (tile, 1)

    # ---- field tap: one brick, both stacked field groups ----
    fdim = (jnp.float32(field_dims[0])
            / jnp.exp2(scal_ref[4, i].astype(jnp.float32)))
    p_field = pos + normal * voxel
    fwx = _axis_twohot(p_field[:, 0:1], scal_ref[5, i].astype(jnp.float32),
                       fdim, world_size, BRICK_F, tile)
    fwy = _axis_twohot(p_field[:, 1:2], scal_ref[6, i].astype(jnp.float32),
                       fdim, world_size, BRICK_F, tile)
    fwz = _axis_twohot(p_field[:, 2:3], scal_ref[7, i].astype(jnp.float32),
                       fdim, world_size, FBZ, tile)
    w3f = _w3(fwx, fwy, fwz, ex_ref[...], ey_ref[...],
              ez_ref[...]).astype(jnp.bfloat16)
    fb = fbuf[slot].reshape(CELLS_F, cpad)
    tap = jax.lax.dot_general(
        w3f, fb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (tile, cpad)

    # ---- basis weighting, fully in-kernel.  The r3 per-cone loop was a
    # ~48-op dependent chain of small ops (measured latency-bound); all
    # K cones now batch through block-diagonal matmuls.  Direction
    # normalization is dropped: the per-cone weight is positively
    # homogeneous then sum-normalized, so any positive scale of the cone
    # direction cancels exactly (pows of relu are homogeneous) ----
    bT = basis_ref[...]                                  # (3, nb)

    def pows(w, p):
        for _ in range(int(np.log2(p))):
            w = w * w
        return w

    def norm_rows(v):
        return v * jax.lax.rsqrt(jnp.maximum(
            jnp.sum(v * v, axis=1, keepdims=True), 1e-24))

    # diffuse: cone-weight x spherical-basis contraction (fs:175,198):
    # wp_all[:, k*nb+b] = relu(dv_k . basis_b) for every cone at once
    tbn9 = jnp.concatenate([tangent, bitan, normal], axis=1)
    wp_all = jnp.maximum(jax.lax.dot_general(
        tbn9, cdbd_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32), 0.0)        # (tile, K*nb)
    wp_all = pows(wp_all, power_diffuse)
    sums = jax.lax.dot_general(                          # per-cone sums
        wp_all, sumk_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (tile, K)
    inv = 1.0 / jnp.maximum(sums, 1e-8)
    invx = jax.lax.dot_general(                          # broadcast back
        inv, expk_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (tile, K*nb)
    dw = jax.lax.dot_general(                            # cone-weight fold
        wp_all * invx, wfold_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (tile, nb)

    # specular: reflection of the eye ray about the BUMP normal (fs:217);
    # the eye normalization folds into the single refl normalization
    # (|refl| = |eye| for unit sn) — and refl MUST be unit or the ^32
    # sharpening overflows f32 before the sum-normalization cancels it
    sn = norm_rows(bn_ref[...][:, 0:3])
    eye = cam_ref[0:1, :] - pos
    refl = norm_rows(
        2.0 * jnp.sum(sn * eye, axis=1, keepdims=True) * sn - eye)
    sw = jnp.maximum(jax.lax.dot_general(
        refl, bT, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32), 0.0)
    sw = pows(sw, power_specular)
    sw = sw / jnp.maximum(jnp.sum(sw, axis=1, keepdims=True), 1e-8)

    def fold(wvec, group):
        wr = jax.lax.dot_general(                        # element-repeat x4
            wvec, ed_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (tile, nb*4)
        return jax.lax.dot_general(                      # fold nb blocks
            wr * group, sel_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (tile, 4)

    diffuse = fold(dw, tap[:, :4 * nb])
    if cfield > 4 * nb:
        spec = fold(sw, tap[:, 4 * nb:cfield])
    else:
        spec = jnp.zeros((tile, 4), jnp.float32)
    out = jnp.concatenate(
        [shadow, diffuse, spec,
         jnp.zeros((tile, nout - 9), jnp.float32)], axis=1)
    out_ref[...] = out


def _tap_pallas(statics, gbuf, scalars, bumpn, campos, light_mips,
                field_mips) -> Array:
    """The raw pallas_call; statics = (cfield, nb, world_size, voxel,
    shadow_offset, power_diffuse, power_specular, cones_static,
    interpret, tile)."""
    (cfield, nb, world_size, voxel, shadow_offset, power_diffuse,
     power_specular, cones_static, interpret, tile) = statics
    cone_dirs = np.asarray(cones_static[0], np.float32)
    cone_weights = np.asarray(cones_static[1], np.float32)
    basis = np.asarray(cones_static[2], np.float32)
    assert basis.shape[0] == nb
    n = gbuf.shape[0]
    ntiles = n // tile
    assert n % tile == 0
    cpad = field_mips[0].shape[-1]
    assert cpad == _ceil_to(cfield, LANE), (cpad, cfield)
    assert bumpn.shape == (n, 4), bumpn.shape
    nout = 16
    light_dims = tuple(m.shape[0] for m in light_mips)
    light_zs = tuple(m.shape[2] for m in light_mips)
    field_dims = tuple(m.shape[0] for m in field_mips)
    lzb = light_zs[0]

    foldx = np.zeros((BRICK_L * LBY, BRICK_L), np.float32)
    for xx in range(BRICK_L):
        foldx[xx * LBY:(xx + 1) * LBY, xx] = 1.0
    sel = np.zeros((4 * nb, 4), np.float32)
    for b in range(nb):
        sel[b * 4:(b + 1) * 4] = np.eye(4, dtype=np.float32)
    ex, ey, ez = expansion_matrices()
    ed = np.repeat(np.eye(nb, dtype=np.float32), 4, axis=1)   # (nb, 4nb)

    # batched diffuse cone weighting: cdbd[3a+j, k*nb+b] = cd[k][a] *
    # basis[b][j] fuses the per-cone direction build (tbn9 @ CD) with the
    # basis cosine matmul (@ blockdiag(basis^T)) into one contraction
    kc = cone_dirs.shape[0]
    cdbd = np.zeros((9, kc * nb), np.float32)
    for k in range(kc):
        for a in range(3):          # tbn9 axis block (tangent/bitan/normal)
            for j in range(3):      # xyz component
                cdbd[3 * a + j, k * nb:(k + 1) * nb] = \
                    cone_dirs[k][a] * basis[:, j]
    sumk = np.kron(np.eye(kc, dtype=np.float32), np.ones((nb, 1), np.float32))
    expk = sumk.T.copy()
    wfold = np.concatenate(
        [w * np.eye(nb, dtype=np.float32) for w in cone_weights], axis=0)

    kern = functools.partial(
        _tap_kernel, nl=len(light_mips), nf=len(field_mips), cfield=cfield,
        cpad=cpad, world_size=world_size, voxel=voxel,
        shadow_offset=shadow_offset, light_dims=light_dims,
        light_zs=light_zs, field_dims=field_dims, cone_dirs=cone_dirs,
        cone_weights=cone_weights, nb=nb,
        power_diffuse=int(power_diffuse),
        power_specular=int(power_specular), nout=nout, tile=tile)

    def _whole(i, s):
        return (0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=(
            [pl.BlockSpec((tile, gbuf.shape[1]), lambda i, s: (i, 0),
                          memory_space=pltpu.VMEM),
             pl.BlockSpec((tile, 4), lambda i, s: (i, 0),
                          memory_space=pltpu.VMEM),
             pl.BlockSpec((1, 3), lambda i, s: (0, 0),
                          memory_space=pltpu.VMEM),
             pl.BlockSpec((BRICK_L * LBY, BRICK_L), _whole,
                          memory_space=pltpu.VMEM),
             pl.BlockSpec((3, nb), _whole, memory_space=pltpu.VMEM),
             pl.BlockSpec((4 * nb, 4), _whole, memory_space=pltpu.VMEM),
             pl.BlockSpec((BRICK_F, CELLS_F), _whole,
                          memory_space=pltpu.VMEM),
             pl.BlockSpec((BRICK_F, CELLS_F), _whole,
                          memory_space=pltpu.VMEM),
             pl.BlockSpec((FBZ, CELLS_F), _whole,
                          memory_space=pltpu.VMEM),
             pl.BlockSpec((nb, 4 * nb), _whole, memory_space=pltpu.VMEM),
             pl.BlockSpec((9, kc * nb), _whole, memory_space=pltpu.VMEM),
             pl.BlockSpec((kc * nb, kc), _whole, memory_space=pltpu.VMEM),
             pl.BlockSpec((kc, kc * nb), _whole, memory_space=pltpu.VMEM),
             pl.BlockSpec((kc * nb, nb), _whole, memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(memory_space=pl.ANY)] * len(light_mips)
            + [pl.BlockSpec(memory_space=pl.ANY)] * len(field_mips)
        ),
        out_specs=pl.BlockSpec((tile, nout), lambda i, s: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, BRICK_L, LBY, lzb), jnp.bfloat16),
            pltpu.VMEM((2, BRICK_F, BRICK_F, FBZ, cpad), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # (8, ntiles): SMEM pads the trailing dim to 128 lanes, so the tile
    # count must ride the leading dim or the prefetch blows the 1MB SMEM
    # budget at 1080p (8160 tiles x 128-lane padding = 4 MB).
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, nout), jnp.float32),
        interpret=interpret,
    )(scalars.T, gbuf, bumpn, campos[None, :], jnp.asarray(foldx),
      jnp.asarray(basis.T), jnp.asarray(sel), jnp.asarray(ex),
      jnp.asarray(ey), jnp.asarray(ez), jnp.asarray(ed),
      jnp.asarray(cdbd), jnp.asarray(sumk), jnp.asarray(expk),
      jnp.asarray(wfold), *light_mips, *field_mips)


def tap_tiles_ref(gbuf: Array, scalars: Array, bumpn: Array,
                  campos: Array, light_mips, field_mips,
                  *, cfield: int, nb: int,
                  world_size: float, voxel: float, shadow_offset: float,
                  power_diffuse: int, power_specular: int, cones_static,
                  tile: int = TILE) -> Array:
    """Pure-jnp mirror of the tap kernel's semantics: per-tile mip-level
    trilinear taps + in-kernel weight computation and folds — float32,
    fully differentiable.  Serves as (a) the oracle tests compare the
    kernel against and (b) the linearization point for the kernel's
    custom VJP (the taps are linear in the volumes, so the ref's VJP is
    exact for them regardless of the kernel's bf16 forward rounding)."""
    from vct_tpu.core import grid as G

    cone_dirs = np.asarray(cones_static[0], np.float32)
    cone_w = np.asarray(cones_static[1], np.float32)
    basis = jnp.asarray(np.asarray(cones_static[2], np.float32))
    n = gbuf.shape[0]
    nout = 16

    pos = gbuf[:, 0:3]
    normal = gbuf[:, 3:6]
    geo = gbuf[:, 6:9]
    tangent = gbuf[:, 9:12]
    bitan = gbuf[:, 12:15]
    uvw_l = G.world_to_uvw(pos + geo * (voxel * shadow_offset), world_size)
    uvw_f = G.world_to_uvw(pos + normal * voxel, world_size)
    lvl_l = jnp.repeat(scalars[:, 0], tile)
    lvl_f = jnp.repeat(scalars[:, 4], tile)

    shadow = jnp.zeros((n,), jnp.float32)
    for li, m in enumerate(light_mips):
        d = m.shape[0]
        vol = m[:, :d, :d].astype(jnp.float32)[..., None]
        sv = G.trilinear_sample(vol, uvw_l)[..., 0]
        shadow = jnp.where(lvl_l == li, sv, shadow)

    tap = jnp.zeros((n, cfield), jnp.float32)
    for fi, m in enumerate(field_mips):
        d = m.shape[0]
        vol = m[:, :, :d, :cfield].astype(jnp.float32)
        sv = G.trilinear_sample(vol, uvw_f)
        tap = jnp.where((lvl_f == fi)[:, None], sv, tap)

    def pows(w, p):
        for _ in range(int(np.log2(p))):
            w = w * w
        return w

    def norm_rows(v):
        return v * jax.lax.rsqrt(jnp.maximum(
            jnp.sum(v * v, axis=1, keepdims=True), 1e-24))

    dw = jnp.zeros((n, nb), jnp.float32)
    for ck in range(cone_dirs.shape[0]):
        cd = cone_dirs[ck]
        dv = norm_rows(tangent * float(cd[0]) + bitan * float(cd[1])
                       + normal * float(cd[2]))
        wp = pows(jnp.maximum(dv @ basis.T, 0.0), power_diffuse)
        wp = wp / jnp.maximum(jnp.sum(wp, axis=1, keepdims=True), 1e-8)
        dw = dw + float(cone_w[ck]) * wp

    sn = norm_rows(bumpn[:, 0:3])
    eye = norm_rows(campos[None, :] - pos)
    refl = norm_rows(
        2.0 * jnp.sum(sn * eye, axis=1, keepdims=True) * sn - eye)
    sw = pows(jnp.maximum(refl @ basis.T, 0.0), power_specular)
    sw = sw / jnp.maximum(jnp.sum(sw, axis=1, keepdims=True), 1e-8)

    def fold(wvec, group):
        return jnp.einsum("nb,nbc->nc", wvec,
                          group.reshape(n, nb, 4))

    diffuse = fold(dw, tap[:, :4 * nb])
    if cfield > 4 * nb:
        spec = fold(sw, tap[:, 4 * nb:cfield])
    else:
        spec = jnp.zeros((n, 4), jnp.float32)
    return jnp.concatenate(
        [shadow[:, None], diffuse, spec,
         jnp.zeros((n, nout - 9), jnp.float32)], axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _tap_call(statics, gbuf, scalars, bumpn, campos, light_mips,
              field_mips):
    return _tap_pallas(statics, gbuf, scalars, bumpn, campos, light_mips,
                       field_mips)


def _tap_fwd(statics, gbuf, scalars, bumpn, campos, light_mips,
             field_mips):
    out = _tap_pallas(statics, gbuf, scalars, bumpn, campos, light_mips,
                      field_mips)
    return out, (gbuf, scalars, bumpn, campos, light_mips, field_mips)


def _tap_bwd(statics, res, bar):
    gbuf, scalars, bumpn, campos, light_mips, field_mips = res
    (cfield, nb, world_size, voxel, shadow_offset, power_diffuse,
     power_specular, cones_static, _interpret, tile) = statics

    def ref(g, bn, cp, lm, fm):
        return tap_tiles_ref(
            g, scalars, bn, cp, lm, fm, cfield=cfield, nb=nb,
            world_size=world_size, voxel=voxel,
            shadow_offset=shadow_offset, power_diffuse=power_diffuse,
            power_specular=power_specular, cones_static=cones_static,
            tile=tile)

    _, vjp = jax.vjp(ref, gbuf, bumpn, campos, light_mips, field_mips)
    dg, dbn, dcp, dlm, dfm = vjp(bar)
    dscal = np.zeros(scalars.shape, jax.dtypes.float0)
    return dg, dscal, dbn, dcp, dlm, dfm


_tap_call.defvjp(_tap_fwd, _tap_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("cfield", "nb", "world_size", "voxel", "shadow_offset",
                     "power_diffuse", "power_specular", "cones_static",
                     "interpret", "tile"))
def tap_tiles(gbuf: Array,                 # (ntiles*tile, >=24) tile-major
              scalars: Array,              # (ntiles, 8) int32
              bumpn: Array,                # (ntiles*tile, 4): bump normal
              campos: Array,               # (3,) camera position
              light_mips: Tuple[Array, ...],   # (D, max(D,LBY), pad128(D))
              field_mips: Tuple[Array, ...],   # (D,D,max(D,FBZ),pad128(C))
              *, cfield: int, nb: int, world_size: float, voxel: float,
              shadow_offset: float, power_diffuse: int,
              power_specular: int, cones_static,
              interpret: bool = False, tile: int = TILE) -> Array:
    """Per-pixel (shadow, weighted diffuse rgba, weighted specular rgba).

    light_mips/field_mips must come from pack_light_mips/pack_field_mips;
    cfield is the LOGICAL field channel count (the packed arrays carry it
    zero-padded to a LANE multiple).  bumpn carries the BUMP shading
    normal in columns 0:3 (the specular reflection axis); cones_static =
    (cone_dirs, cone_weights, basis) nested tuples (hashable).  Both
    basis weightings run in-kernel on the MXU — the equivalent XLA
    elementwise graph measured 75 ms/frame at 1080p (r3).  Returns
    (ntiles*tile, 16) f32: [shadow, diffuse rgb+occ, spec rgb+occ, pad].

    Differentiable: reverse-mode gradients to gbuf (incl. the bump
    normal), the camera position, and BOTH volume mip stacks flow through
    the exact jnp reference (tap_tiles_ref) via a custom VJP — the
    inverse-rendering camera pass runs this kernel.
    """
    assert power_diffuse & (power_diffuse - 1) == 0, power_diffuse
    assert power_specular & (power_specular - 1) == 0, power_specular
    statics = (cfield, nb, world_size, voxel, shadow_offset,
               int(power_diffuse), int(power_specular), cones_static,
               interpret, tile)
    return _tap_call(statics, gbuf, scalars, bumpn, campos,
                     tuple(light_mips), tuple(field_mips))
