"""Pallas tiled deferred-shading taps: per-image-tile brick DMA + MXU taps.

The camera pass's per-pixel volume taps (shadow transmittance + cone-field
gathers, render/shading.py) are XLA gathers, measured row-bound at ~50M
rows/s regardless of row width (scripts/bench_gather.py) — 2.5 s/frame at
1080p.  This kernel exploits IMAGE-TILE COHERENCE instead: the 256 pixels
of a 16x16 tile hit nearby world positions, so per tile we

  1. pick the finest mip level whose 8^3 brick covers the tile's tap-point
     AABB (selected in an XLA prepass, shipped as prefetch scalars),
  2. DMA that one brick from HBM (light: 2 KB, field: ~213 KB bf16),
  3. evaluate every pixel's EXACT trilinear tap as a two-hot-weight matmul
     on the MXU: W3 (256 px, 512 cells) @ brick (512 cells, C).

Quadrilinear semantics vs core/grid.py: within the selected level the tap
is exactly grid.trilinear_sample; tiles whose AABB spans more than a brick
at level 0 sample a coarser level (the same footprint-driven lod selection
the cone march itself uses, fs:96-97) — tests bound the difference.

The diffuse basis weighting (shading.indirect_diffuse_field's cone-weight x
spherical-basis contraction) runs in-kernel on the tapped values; the
specular tap returns the raw per-basis vec4s so the XLA side can weight
them with the bump-mapped reflection direction (renderer.shade_gbuffer).

Coarsest mip level == brick size, so every tile fits SOME level by
construction.
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
BRICK_L = 16      # light-volume brick voxels per axis (16 KB f32 DMA)
BRICK_F = 8       # field brick voxels per axis (~213 KB bf16 DMA at C=208)
CELLS_F = BRICK_F ** 3


# ---------------------------------------------------------------------------
# XLA prepass: per-tile level + brick-origin selection
# ---------------------------------------------------------------------------

def select_bricks(uvw: Array, valid: Array, dims: Sequence[int],
                  brick: int) -> Tuple[Array, Array]:
    """Per-tile mip level + brick origin for tap points.

    uvw: (ntiles, TILE, 3) in [0,1]; valid: (ntiles, TILE) bool.
    dims: per-level grid dims, finest first; dims[-1] must equal brick so
    the coarsest level always fits.
    Returns (level (ntiles,) int32, origin (ntiles, 3) int32).
    """
    assert dims[-1] == brick, dims
    big = jnp.float32(3e38)
    fits = []
    origins = []
    for d in dims:
        t = jnp.clip(uvw * d - 0.5, 0.0, d - 1.0)      # (ntiles, TILE, 3)
        tlo = jnp.min(jnp.where(valid[..., None], t, big), axis=1)
        thi = jnp.max(jnp.where(valid[..., None], t, -big), axis=1)
        lo = jnp.floor(tlo)
        hi = jnp.floor(thi)
        fit = jnp.all(hi - lo <= brick - 2, axis=-1)   # room for the +1 corner
        origins.append(jnp.clip(lo, 0, d - brick).astype(jnp.int32))
        fits.append(fit)
    fits = jnp.stack(fits, axis=1)                      # (ntiles, nlev)
    fits = fits.at[:, -1].set(True)                     # coarsest always fits
    level = jnp.argmax(fits, axis=1).astype(jnp.int32)  # first fitting level
    origin = jnp.take_along_axis(
        jnp.stack(origins, axis=1), level[:, None, None], axis=1)[:, 0]
    any_valid = jnp.any(valid, axis=1)
    level = jnp.where(any_valid, level, len(dims) - 1)
    origin = jnp.where(any_valid[:, None], origin, 0)
    return level, origin


# ---------------------------------------------------------------------------
# kernel helpers
# ---------------------------------------------------------------------------

def _axis_twohot(p_ax: Array, origin_ax, dim, world_size: float,
                 brick: int) -> Array:
    """One axis's two-hot weights: p_ax (TILE, 1) world coords -> (TILE,
    brick) f32.  Matches grid.world_to_uvw + the edge-clamped texel-center
    convention of grid.trilinear_sample, rebased to the brick origin."""
    uvw = p_ax / (world_size * 0.5) * 0.5 + 0.5
    t = jnp.clip(uvw * dim - 0.5, 0.0, dim - 1.0) - origin_ax
    i0 = jnp.clip(jnp.floor(t), 0, brick - 2)
    f = jnp.clip(t - i0, 0.0, 1.0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE, brick), 1)
    i = i0.astype(jnp.int32)
    return (jnp.where(cols == i, 1.0 - f, 0.0)
            + jnp.where(cols == i + 1, f, 0.0))


def _w3(wx: Array, wy: Array, wz: Array, ex, ey, ez) -> Array:
    """(TILE, BRICK_F)^3 two-hots -> (TILE, CELLS_F) trilinear weights,
    cell index j = ((x * BRICK_F) + y) * BRICK_F + z.  ex/ey/ez are the
    static (BRICK_F, CELLS_F) 0/1 expansion matrices."""
    def exp(w, e):
        return jax.lax.dot_general(
            w, e, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return exp(wx, ex) * exp(wy, ey) * exp(wz, ez)


def expansion_matrices() -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Static (BRICK_F, CELLS_F) matrices: E[a, j] = 1 iff coord(j) == a."""
    j = np.arange(CELLS_F)
    jx = j // (BRICK_F * BRICK_F)
    jy = (j // BRICK_F) % BRICK_F
    jz = j % BRICK_F
    a = np.arange(BRICK_F)[:, None]
    return ((jx[None] == a).astype(np.float32),
            (jy[None] == a).astype(np.float32),
            (jz[None] == a).astype(np.float32))


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _tap_kernel(scal_ref,                 # (ntiles, 8) int32 prefetch
                gbuf_ref,                 # (TILE, 24) f32
                foldx_ref,                # (BRICK_L^2, BRICK_L) static fold
                basis_ref,                # (3, nb) basis directions^T
                sel_ref,                  # (4nb, 4) static fold
                ex_ref, ey_ref, ez_ref,   # (BRICK_F, CELLS_F) expansions
                ed_ref,                   # (nb, 4nb) diffuse-weight expansion
                *refs,
                nl: int, nf: int, cfield: int, world_size: float,
                voxel: float, shadow_offset: float,
                light_dims: Tuple[int, ...], field_dims: Tuple[int, ...],
                cone_dirs: np.ndarray, cone_weights: np.ndarray,
                nb: int, power_diffuse: int, nout: int):
    light_refs = refs[:nl]
    field_refs = refs[nl:nl + nf]
    out_ref = refs[nl + nf]
    lbuf = refs[nl + nf + 1]              # (2, BRICK_L^3) f32
    fbuf = refs[nl + nf + 2]              # (2, BRICK_F^3, C) bf16
    lsem = refs[nl + nf + 3]
    fsem = refs[nl + nf + 4]

    i = pl.program_id(0)
    n = pl.num_programs(0)

    def light_dma(tile, slot):
        lvl = scal_ref[tile, 0]
        ox, oy, oz = scal_ref[tile, 1], scal_ref[tile, 2], scal_ref[tile, 3]
        for li, ref in enumerate(light_refs):
            @pl.when(lvl == li)
            def _():
                pltpu.make_async_copy(
                    ref.at[pl.ds(ox, BRICK_L), pl.ds(oy, BRICK_L),
                           pl.ds(oz, BRICK_L)],
                    lbuf.at[slot], lsem.at[slot]).start()

    def field_dma(tile, slot):
        lvl = scal_ref[tile, 4]
        ox, oy, oz = scal_ref[tile, 5], scal_ref[tile, 6], scal_ref[tile, 7]
        for fi, ref in enumerate(field_refs):
            @pl.when(lvl == fi)
            def _():
                pltpu.make_async_copy(
                    ref.at[pl.ds(ox, BRICK_F), pl.ds(oy, BRICK_F),
                           pl.ds(oz, BRICK_F), :],
                    fbuf.at[slot], fsem.at[slot]).start()

    @pl.when(i == 0)
    def _():
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
            / jnp.exp2(scal_ref[i, 0].astype(jnp.float32)))
    p_light = pos + geo_n * (voxel * shadow_offset)
    lwx = _axis_twohot(p_light[:, 0:1], scal_ref[i, 1].astype(jnp.float32),
                       ldim, world_size, BRICK_L)
    lwy = _axis_twohot(p_light[:, 1:2], scal_ref[i, 2].astype(jnp.float32),
                       ldim, world_size, BRICK_L)
    lwz = _axis_twohot(p_light[:, 2:3], scal_ref[i, 3].astype(jnp.float32),
                       ldim, world_size, BRICK_L)
    # separable contraction: (x,y,z) brick -> (xy, z) 2-D (leading-dim
    # reshape, lane dim intact), z via MXU, y via static fold matrix
    b2 = lbuf[slot].reshape(BRICK_L * BRICK_L, BRICK_L)  # (xy, z)
    tz = jax.lax.dot_general(
        lwz, b2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (TILE, xy)
    txy = tz * jnp.tile(lwy, (1, BRICK_L))               # weight by wy[y]
    tx = jax.lax.dot_general(
        txy, foldx_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (TILE, x)
    shadow = jnp.sum(tx * lwx, axis=1, keepdims=True)    # (TILE, 1)

    # ---- field tap: one brick, both stacked field groups ----
    fdim = (jnp.float32(field_dims[0])
            / jnp.exp2(scal_ref[i, 4].astype(jnp.float32)))
    p_field = pos + normal * voxel
    fwx = _axis_twohot(p_field[:, 0:1], scal_ref[i, 5].astype(jnp.float32),
                       fdim, world_size, BRICK_F)
    fwy = _axis_twohot(p_field[:, 1:2], scal_ref[i, 6].astype(jnp.float32),
                       fdim, world_size, BRICK_F)
    fwz = _axis_twohot(p_field[:, 2:3], scal_ref[i, 7].astype(jnp.float32),
                       fdim, world_size, BRICK_F)
    w3f = _w3(fwx, fwy, fwz, ex_ref[...], ey_ref[...],
              ez_ref[...]).astype(jnp.bfloat16)
    fb = fbuf[slot].reshape(CELLS_F, cfield)
    tap = jax.lax.dot_general(
        w3f, fb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (TILE, cfield)

    # ---- diffuse basis weighting (shading.indirect_diffuse_field) ----
    k = cone_dirs.shape[0]
    bT = basis_ref[...]                                  # (3, nb)
    dw = jnp.zeros((TILE, nb), jnp.float32)
    for ck in range(k):
        # world-space cone dir: normalize(TBN @ dir_k), fs:175,198
        cd = cone_dirs[ck]
        d = tangent * float(cd[0]) + bitan * float(cd[1]) \
            + normal * float(cd[2])
        d = d * jax.lax.rsqrt(jnp.maximum(
            jnp.sum(d * d, axis=1, keepdims=True), 1e-24))
        cos = jax.lax.dot_general(
            d, bT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (TILE, nb)
        wp = jnp.maximum(cos, 0.0)
        for _ in range(int(np.log2(power_diffuse))):     # w ** power
            wp = wp * wp
        wp = wp / jnp.maximum(jnp.sum(wp, axis=1, keepdims=True), 1e-8)
        dw = dw + float(cone_weights[ck]) * wp

    dtap = tap[:, :4 * nb]                               # diffuse group
    # sum_b dw[p,b] * dtap[p, b*4 + c] without lane-splitting reshapes:
    dwr = jax.lax.dot_general(                           # element-repeat x4
        dw, ed_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (TILE, nb*4)
    wtap = dwr * dtap
    # fold nb blocks of 4 via the static (4nb, 4) selection matrix
    diffuse = jax.lax.dot_general(
        wtap, sel_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (TILE, 4)

    parts = [shadow, diffuse, jnp.zeros((TILE, 3), jnp.float32)]
    if cfield > 4 * nb:                                  # specular group raw
        parts.append(tap[:, 4 * nb:])
    out = jnp.concatenate(parts, axis=1)
    out_ref[...] = out[:, :nout]


@functools.partial(
    jax.jit,
    static_argnames=("world_size", "voxel", "shadow_offset", "power_diffuse",
                     "interpret", "cones_static"))
def tap_tiles(gbuf: Array,                 # (ntiles*TILE, 24) tile-major
              scalars: Array,              # (ntiles, 8) int32
              light_mips: Tuple[Array, ...],   # each (D,D,D) f32
              field_mips: Tuple[Array, ...],   # each (D,D,D,C) bf16
              *, world_size: float, voxel: float, shadow_offset: float,
              power_diffuse: int, cones_static, interpret: bool = False
              ) -> Array:
    """Per-pixel (shadow, diffuse rgba, raw specular per-basis vec4s).

    cones_static: (cone_dirs, cone_weights, basis) as nested tuples (hashable
    static arg); returns (ntiles*TILE, 8 + [4*nb]) f32.
    """
    cone_dirs = np.asarray(cones_static[0], np.float32)
    cone_weights = np.asarray(cones_static[1], np.float32)
    basis = np.asarray(cones_static[2], np.float32)
    assert power_diffuse & (power_diffuse - 1) == 0, power_diffuse
    n = gbuf.shape[0]
    ntiles = n // TILE
    assert n % TILE == 0
    cfield = field_mips[0].shape[-1]
    nb = basis.shape[0]
    has_spec = cfield > 4 * nb
    nout = 8 + (cfield - 4 * nb if has_spec else 0)
    light_dims = tuple(m.shape[0] for m in light_mips)
    field_dims = tuple(m.shape[0] for m in field_mips)

    foldx = np.zeros((BRICK_L * BRICK_L, BRICK_L), np.float32)
    for xx in range(BRICK_L):
        foldx[xx * BRICK_L:(xx + 1) * BRICK_L, xx] = 1.0
    sel = np.zeros((4 * nb, 4), np.float32)
    for b in range(nb):
        sel[b * 4:(b + 1) * 4] = np.eye(4, dtype=np.float32)
    ex, ey, ez = expansion_matrices()
    ed = np.repeat(np.eye(nb, dtype=np.float32), 4, axis=1)   # (nb, 4nb)

    kern = functools.partial(
        _tap_kernel, nl=len(light_mips), nf=len(field_mips), cfield=cfield,
        world_size=world_size, voxel=voxel, shadow_offset=shadow_offset,
        light_dims=light_dims, field_dims=field_dims, cone_dirs=cone_dirs,
        cone_weights=cone_weights, nb=nb, power_diffuse=power_diffuse,
        nout=nout)

    def _whole(i, s):
        return (0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=(
            [pl.BlockSpec((TILE, gbuf.shape[1]), lambda i, s: (i, 0),
                          memory_space=pltpu.VMEM),
             pl.BlockSpec((BRICK_L * BRICK_L, BRICK_L), _whole,
                          memory_space=pltpu.VMEM),
             pl.BlockSpec((3, nb), _whole, memory_space=pltpu.VMEM),
             pl.BlockSpec((4 * nb, 4), _whole, memory_space=pltpu.VMEM),
             pl.BlockSpec((BRICK_F, CELLS_F), _whole,
                          memory_space=pltpu.VMEM),
             pl.BlockSpec((BRICK_F, CELLS_F), _whole,
                          memory_space=pltpu.VMEM),
             pl.BlockSpec((BRICK_F, CELLS_F), _whole,
                          memory_space=pltpu.VMEM),
             pl.BlockSpec((nb, 4 * nb), _whole, memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(memory_space=pl.ANY)] * len(light_mips)
            + [pl.BlockSpec(memory_space=pl.ANY)] * len(field_mips)
        ),
        out_specs=pl.BlockSpec((TILE, nout), lambda i, s: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, BRICK_L, BRICK_L, BRICK_L), jnp.float32),
            pltpu.VMEM((2, BRICK_F, BRICK_F, BRICK_F, cfield), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, nout), jnp.float32),
        interpret=interpret,
    )(scalars, gbuf, jnp.asarray(foldx), jnp.asarray(basis.T),
      jnp.asarray(sel), jnp.asarray(ex), jnp.asarray(ey), jnp.asarray(ez),
      jnp.asarray(ed), *light_mips, *field_mips)
