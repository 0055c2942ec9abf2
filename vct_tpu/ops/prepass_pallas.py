"""Fused per-tile prepass kernel: light + field + material brick selection.

The fast frame path needs, per 16x16 image tile: the mip level + brick
origin covering the tile's shadow taps (ops/tap_pallas.select_light_bricks),
its field taps (select_field_bricks), and — for textured scenes — the
per-material atlas level/origin entries and per-pixel material slots
(ops/material_pallas.select_material_bricks).  As XLA graphs these are
masked min/max reductions over (ntiles, 256, M) broadcasts; measured r4 on
the v5e they cost 24 ms (light+field) + 50 ms (material) per 1080p frame —
more than the kernels they feed.  TPU reductions of this shape are simply
a bad fit for XLA's tiling, so this kernel fuses ALL the per-tile
selection work into one Pallas pass over the G-buffer: one grid step per
tile, everything in VMEM, the per-material statistics as lane-vector
math + tiny selection matmuls (no transposes, no gathers).

Outputs (all int32):
  scal8  (ntiles, 8)      — [light level, light origin xyz,
                             field level, field origin xyz]
                             == the tap_tiles prefetch scalars
  mscal  (ntiles, NSCAL)  — [count, slot-0 material, level, bv, bu]
                             == material_tiles' prefetch scalars
  mlists (ntiles, NWORDS) — overflow material entries (4 words/slot)
  mslots (n, 1)           — per-pixel material slot

Selection semantics are EXACTLY the XLA helpers' (they remain the oracle,
tests/test_prepass_pallas.py pins equality): same thresholds, same
first-fit-finest level rule, same alignment and clipping, same
ascending-material-id slot order.  Texel bases clip to +-2^22 so the
int-valued f32 vector math stays exact.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vct_tpu.ops import material_pallas as MP
from vct_tpu.ops import tap_pallas as TP

Array = jax.Array

NSCAL = MP.NSCAL
NSLOT = MP.NSLOT
NWORDS = MP.NWORDS
BCLIP = float(2 ** 22)      # exact-in-f32 texel-base clip


def _ceil_to(n: int, m: int) -> int:
    return -(-n // m) * m


def _sel_axis(umin, umax, dims, threshs, origin_fn):
    """First-fit-finest level + origin over (1, 3) uvw extrema rows.

    Mirrors tap_pallas._select: per level, cell bounds lo/hi; fits when
    every thresholded axis footprint <= thresh; the coarsest level is
    forced.  Iterates coarse -> fine overwriting, which equals
    argmax-of-first-fit."""
    nlev = len(dims)
    level = jnp.int32(nlev - 1)
    d_last = dims[-1]
    lo = jnp.floor(jnp.clip(umin * d_last - 0.5, 0.0, d_last - 1.0))
    origin = origin_fn(lo, d_last)
    for li in range(nlev - 2, -1, -1):
        d = dims[li]
        lo = jnp.floor(jnp.clip(umin * d - 0.5, 0.0, d - 1.0))
        hi = jnp.floor(jnp.clip(umax * d - 0.5, 0.0, d - 1.0))
        fits = None
        for ax, th in enumerate(threshs):
            if th is None:
                continue
            c = jnp.all(hi[:, ax:ax + 1] - lo[:, ax:ax + 1] <= th)
            fits = c if fits is None else (fits & c)
        level = jnp.where(fits, jnp.int32(li), level)
        origin = jnp.where(fits, origin_fn(lo, d), origin)
    return level, origin


def _aligned(lo, d, extent):
    b = jnp.floor(lo / TP.ALIGN) * TP.ALIGN
    return jnp.clip(b, 0, max(d, extent) - extent)


def _light_origin(lo, d):
    ox = jnp.clip(lo[0, 0], 0, d - TP.BRICK_L)
    oy = _aligned(lo[0, 1], d, TP.LBY)
    return jnp.stack([ox, oy, jnp.float32(0.0)]).reshape(1, 3)


def _field_origin(lo, d):
    ox = jnp.clip(lo[0, 0], 0, d - TP.BRICK_F)
    oy = jnp.clip(lo[0, 1], 0, d - TP.BRICK_F)
    oz = _aligned(lo[0, 2], d, TP.FBZ)
    return jnp.stack([ox, oy, oz]).reshape(1, 3)


@functools.lru_cache(maxsize=None)
def _placement() -> np.ndarray:
    """(4*NSLOT, NWORDS) 0/1: stacks the four per-field matrices that
    scatter compacted slot entries 1.. into the interleaved list row."""
    p = np.zeros((4, NSLOT, NWORDS), np.float32)
    for k in range(4):
        for s in range(1, NSLOT):
            p[k, s, 4 * (s - 1) + k] = 1.0
    return p.reshape(4 * NSLOT, NWORDS)


GROUP = 8         # tiles per grid step: Mosaic requires output block rows
                  # divisible by 8, and the grouping amortizes per-step cost


def _prepass_kernel(gbuf_ref, place_ref, scal8_ref, mscal_ref, mlists_ref,
                    mslots_ref,
                    *, light_dims, field_dims, num_materials: int,
                    resolution: int, atlas_levels: int, voxel: float,
                    world_size: float, shadow_offset: float,
                    has_atlas: bool, tile: int):
    for k in range(GROUP):
        _one_tile(k, gbuf_ref, place_ref, scal8_ref, mscal_ref,
                  mlists_ref, mslots_ref, light_dims=light_dims,
                  field_dims=field_dims, num_materials=num_materials,
                  resolution=resolution, atlas_levels=atlas_levels,
                  voxel=voxel, world_size=world_size,
                  shadow_offset=shadow_offset, has_atlas=has_atlas,
                  tile=tile)


def _one_tile(k, gbuf_ref, place_ref, scal8_ref, mscal_ref, mlists_ref,
              mslots_ref,
              *, light_dims, field_dims, num_materials: int,
              resolution: int, atlas_levels: int, voxel: float,
              world_size: float, shadow_offset: float,
              has_atlas: bool, tile: int):
    g = gbuf_ref[k * tile:(k + 1) * tile, :]
    pos = g[:, 0:3]
    nrm = g[:, 3:6]
    geo = g[:, 6:9]
    hit = g[:, 19:20] > 0.5
    big = jnp.float32(3e38)
    any_valid = jnp.any(hit)

    def uvw(p):
        return p / (world_size * 0.5) * 0.5 + 0.5

    def aabb(p):
        lo = jnp.min(jnp.where(hit, p, big), axis=0, keepdims=True)
        hi = jnp.max(jnp.where(hit, p, -big), axis=0, keepdims=True)
        return lo, hi

    # ---- light + field brick selection (tap_pallas._select semantics) --
    lmin, lmax = aabb(uvw(pos + geo * (voxel * shadow_offset)))
    llev, lorg = _sel_axis(
        lmin, lmax, light_dims,
        (TP.BRICK_L - 2, TP.BRICK_L - 2, None), _light_origin)
    fmin, fmax = aabb(uvw(pos + nrm * voxel))
    flev, forg = _sel_axis(
        fmin, fmax, field_dims,
        (TP.BRICK_F - 2, TP.BRICK_F - 2, TP.FBZ - TP.ALIGN - 1),
        _field_origin)
    llev = jnp.where(any_valid, llev, len(light_dims) - 1)
    flev = jnp.where(any_valid, flev, len(field_dims) - 1)
    lorg = jnp.where(any_valid, lorg, 0.0)
    forg = jnp.where(any_valid, forg, 0.0)
    scal8_ref[k:k + 1, :] = jnp.concatenate(
        [llev.reshape(1, 1).astype(jnp.float32), lorg,
         flev.reshape(1, 1).astype(jnp.float32), forg],
        axis=1).astype(jnp.int32)

    if not has_atlas:
        mscal_ref[k:k + 1, :] = jnp.zeros((1, NSCAL), jnp.int32)
        mlists_ref[k:k + 1, :] = jnp.zeros((1, NWORDS), jnp.int32)
        mslots_ref[k * tile:(k + 1) * tile, :] = jnp.zeros(
            (tile, 1), jnp.int32)
        return

    # ---- per-material atlas selection (material_pallas semantics) -----
    mm = num_materials
    mat = g[:, 17:18].astype(jnp.int32)
    u = g[:, 15:16]
    q = 1.0 - g[:, 16:17]
    iota_m = jax.lax.broadcasted_iota(jnp.int32, (tile, mm), 1)
    onehot = (iota_m == mat) & hit                    # (tile, M)

    def mreduce(x, init, op):
        return op(jnp.where(onehot, x, init), axis=0, keepdims=True)

    umin = mreduce(u, big, jnp.min)                   # (1, M)
    umax = mreduce(u, -big, jnp.max)
    qmin = mreduce(q, big, jnp.min)
    qmax = mreduce(q, -big, jnp.max)
    present = jnp.any(onehot, axis=0, keepdims=True)  # (1, M)

    lvl_m = jnp.full((1, mm), jnp.float32(atlas_levels - 1))
    bv_m = jnp.zeros((1, mm), jnp.float32)
    bu_m = jnp.zeros((1, mm), jnp.float32)
    first = True
    for lv in range(atlas_levels - 1, -1, -1):
        rl = max(resolution >> lv, 1)
        d = 2.0 ** -lv
        base_u = jnp.floor(umin * rl - 0.5)
        hi_u = jnp.floor(umax * rl - 0.5 + d)
        base_v = jnp.floor(qmin * rl - 0.5 - d)
        hi_v = jnp.floor(qmax * rl - 0.5)
        fits = ((hi_u - base_u <= MP.THRESH)
                & (hi_v - base_v <= MP.THRESH)) if not first \
            else jnp.ones((1, mm), bool)              # coarsest forced
        first = False
        bva = TP.ALIGN * jnp.floor(jnp.clip(base_v, -BCLIP, BCLIP)
                                   / TP.ALIGN)
        bua = TP.ALIGN * jnp.floor(jnp.clip(base_u, -BCLIP, BCLIP)
                                   / TP.ALIGN)
        lvl_m = jnp.where(fits, jnp.float32(lv), lvl_m)
        bv_m = jnp.where(fits, bva, bv_m)
        bu_m = jnp.where(fits, bua, bu_m)

    presf = present.astype(jnp.float32)
    count = jnp.sum(presf)
    # slot_of[m] = rank of m among present ids (ascending): LT matmul
    lt = (jax.lax.broadcasted_iota(jnp.int32, (mm, mm), 0)
          < jax.lax.broadcasted_iota(jnp.int32, (mm, mm), 1)
          ).astype(jnp.float32)                       # lt[i, j] = i < j
    slot_of = jax.lax.dot_general(
        presf, lt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # (1, M)

    # per-pixel slot: # present materials with smaller id
    ltpx = (iota_m < mat).astype(jnp.float32)         # (tile, M)
    slot_px = jax.lax.dot_general(
        ltpx, presf, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # (tile, 1)
    slot_px = jnp.clip(jnp.where(hit, slot_px, 0.0), 0, NSLOT - 1)
    mslots_ref[k * tile:(k + 1) * tile, :] = slot_px.astype(jnp.int32)

    # compact entries: B[s, m] = present_m & slot_of_m == s
    iota_s = jax.lax.broadcasted_iota(
        jnp.int32, (NSLOT, mm), 0).astype(jnp.float32)
    sel = ((jnp.broadcast_to(slot_of, (NSLOT, mm)) == iota_s)
           .astype(jnp.float32) * jnp.broadcast_to(presf, (NSLOT, mm)))

    def compact(x):                                   # (1, M) -> (1, NSLOT)
        return jax.lax.dot_general(
            x, sel, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    ids = jax.lax.broadcasted_iota(
        jnp.int32, (1, mm), 1).astype(jnp.float32)
    e_mat = compact(ids * presf)
    e_lvl = compact(lvl_m * presf)
    e_bv = compact(bv_m * presf)
    e_bu = compact(bu_m * presf)

    def slot0(x):
        return jnp.sum(x[:, 0:1])

    mscal_ref[k:k + 1, :] = jnp.concatenate([
        jnp.minimum(count, NSLOT).reshape(1, 1),
        slot0(e_mat).reshape(1, 1), slot0(e_lvl).reshape(1, 1),
        slot0(e_bv).reshape(1, 1), slot0(e_bu).reshape(1, 1),
    ], axis=1).astype(jnp.int32)

    # overflow list row: slots 1.. as 4 interleaved words via static
    # placement matmuls
    place = place_ref[...]                            # (4*NSLOT, NWORDS)
    rowv = jnp.zeros((1, NWORDS), jnp.float32)
    for fi, field in enumerate((e_mat, e_lvl, e_bv, e_bu)):
        rowv = rowv + jax.lax.dot_general(
            field, place[fi * NSLOT:(fi + 1) * NSLOT],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    mlists_ref[k:k + 1, :] = rowv.astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("light_dims", "field_dims", "num_materials",
                              "resolution", "atlas_levels", "voxel",
                              "world_size", "shadow_offset", "has_atlas",
                              "interpret", "tile"))
def prepass_tiles(gbuf: Array,              # (ntiles*tile, >=24) tile-major
                  *, light_dims: Tuple[int, ...],
                  field_dims: Tuple[int, ...], num_materials: int,
                  resolution: int, atlas_levels: int, voxel: float,
                  world_size: float, shadow_offset: float,
                  has_atlas: bool, interpret: bool = False,
                  tile: int = 256):
    """One fused pass: (scal8, mscal, mlists (8-row padded), mslots).

    Oracles: tap_pallas.select_light_bricks / select_field_bricks and
    material_pallas.select_material_bricks (tests pin equality).  When
    has_atlas is False the material outputs are zeros.
    """
    n = gbuf.shape[0]
    ntiles = n // tile
    assert n % tile == 0, n
    # pad to a GROUP multiple of tiles (Mosaic output-block row constraint);
    # pad tiles are all-miss (hit column zero), so they select coarsest
    # levels and zero material counts — trimmed below
    ntp = _ceil_to(ntiles, GROUP)
    if ntp != ntiles:
        gbuf = jnp.concatenate(
            [gbuf, jnp.zeros(((ntp - ntiles) * tile, gbuf.shape[1]),
                             gbuf.dtype)], axis=0)
    kern = functools.partial(
        _prepass_kernel, light_dims=tuple(light_dims),
        field_dims=tuple(field_dims), num_materials=num_materials,
        resolution=resolution, atlas_levels=atlas_levels, voxel=voxel,
        world_size=world_size, shadow_offset=shadow_offset,
        has_atlas=has_atlas, tile=tile)
    gt = tile * GROUP
    scal8, mscal, mlists, mslots = pl.pallas_call(
        kern,
        grid=(ntp // GROUP,),
        in_specs=[pl.BlockSpec((gt, gbuf.shape[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((4 * NSLOT, NWORDS), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((GROUP, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, NSCAL), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, NWORDS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gt, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ntp, 8), jnp.int32),
            jax.ShapeDtypeStruct((ntp, NSCAL), jnp.int32),
            jax.ShapeDtypeStruct((ntp, NWORDS), jnp.int32),
            jax.ShapeDtypeStruct((ntp * tile, 1), jnp.int32),
        ),
        interpret=interpret,
    )(gbuf, jnp.asarray(_placement()))
    # mlists keeps its 8-row padding (material_tiles copies 8-row groups)
    return (scal8[:ntiles], mscal[:ntiles], mlists,
            mslots[:n])
