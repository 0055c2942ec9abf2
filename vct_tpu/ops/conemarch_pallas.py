"""Tiled per-pixel cone-march Pallas kernel with a custom VJP.

Semantics: exactly core/march.py cone_march (the reference loop at
Shader/VoxelConeTracing.fs:82-107) for an ISOTROPIC mip stack and
step_factor == 1 — per-ray quadrilinear pyramid samples at the static step
schedule, front-to-back emission-absorption composite with the loop-top
alpha >= MAX_ALPHA early-out.

TPU-native formulation (no arbitrary gathers — TPU has no fast scalar
gather path):

  * each mip level rides in VMEM as a 2-D table T = (D*D, D*C): rows are
    (x, y) voxel columns, lanes are (z, channel);
  * a trilinear sample of P rays is a TWO-HOT INTERPOLATION MATMUL:
    Wxy (P, D*D) carries the 4 bilinear xy corner weights per ray, so
    Wxy @ T does gather-and-lerp of x and y on the MXU in one shot; the z
    lerp is a lane-masked multiply + a static (D*C, C) channel-sum matmul;
  * the march is a static unrolled loop over the schedule (the lod plan is
    compile-time, core/march.py), carrying (T, color, occ) in registers;
  * the backward pass is the TRANSPOSED matmul: dT += Wxy^T @ dS — the
    deterministic scatter that replaces GPU atomics — plus a closed-form
    reverse recursion through the sequential composite (no divisions, so
    fully-opaque samples a == 1 get correct gradients).

Scope: the whole pyramid must fit VMEM, i.e. grids <= 64^3 float32 RGBA
(~4.8 MB + tile buffers).  This kernel is the per-pixel-parity component
(BASELINE.json north star); the production 256^3 path is the direction-
major dense march (core/dense.py), which restructures the same math to
avoid per-ray gathers altogether — see that module's header.

Gradients flow to the voxel pyramid (the inverse-rendering parameter);
ray origins/directions are static scene geometry here and get zero
cotangents (documented deviation from jax.grad of the jnp oracle, which
also differentiates the trilinear weights w.r.t. position).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vct_tpu.core import march as M

Array = jax.Array

_TILE = 128          # rays per grid program
_MAX_VMEM_DIM = 64   # largest level-0 dim whose pyramid fits VMEM


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.lru_cache(maxsize=None)
def _zsum(d: int, c: int) -> np.ndarray:
    """(D*C, C) channel-sum matrix: out[:, ch] = sum_z in[:, z*C+ch]."""
    m = np.zeros((d * c, c), np.float32)
    for z in range(d):
        for ch in range(c):
            m[z * c + ch, ch] = 1.0
    return m


def _trilin_weights(pos, d: int, c: int, world_size: float):
    """Per-ray two-hot factors for one level.

    pos (P, 3) world -> Wxy (P, D*D) bilinear xy corner weights and
    wz (P, D*C) z-lerp lane weights (broadcast across channels).
    Matches grid.world_to_uvw + grid.trilinear_sample (clamp-to-edge).
    """
    p = pos.shape[0]
    uvw = pos / (world_size * 0.5) * 0.5 + 0.5
    t = uvw * d - 0.5
    i0f = jnp.floor(t)
    f = t - i0f
    i0 = jnp.clip(i0f.astype(jnp.int32), 0, d - 1)
    i1 = jnp.clip(i0f.astype(jnp.int32) + 1, 0, d - 1)

    x0, y0, z0 = i0[:, 0:1], i0[:, 1:2], i0[:, 2:3]
    x1, y1, z1 = i1[:, 0:1], i1[:, 1:2], i1[:, 2:3]
    fx, fy, fz = f[:, 0:1], f[:, 1:2], f[:, 2:3]

    cols = jax.lax.broadcasted_iota(jnp.int32, (p, d * d), 1)
    wxy = (jnp.where(cols == x0 * d + y0, (1 - fx) * (1 - fy), 0.0)
           + jnp.where(cols == x0 * d + y1, (1 - fx) * fy, 0.0)
           + jnp.where(cols == x1 * d + y0, fx * (1 - fy), 0.0)
           + jnp.where(cols == x1 * d + y1, fx * fy, 0.0))

    lane_z = jax.lax.broadcasted_iota(jnp.int32, (p, d * c), 1) // c
    wz = (jnp.where(lane_z == z0, 1.0 - fz, 0.0)
          + jnp.where(lane_z == z1, fz, 0.0))
    return wxy, wz


def _sample_level(level_ref, zsum_ref, pos, d: int, c: int,
                  world_size: float):
    """Trilinear sample of a (D*D, D*C) level table at P positions -> (P, C)."""
    wxy, wz = _trilin_weights(pos, d, c, world_size)
    s = jnp.dot(wxy, level_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    return jnp.dot(s * wz, zsum_ref[:],
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _plan(schedule: M.MarchSchedule, num_levels: int):
    """Static per-step (dist, l0, l1, w, diameter), lods clamped to stack."""
    lp = M._static_lod_plan(schedule.lods, num_levels)
    out = []
    for k, (l0, l1, w) in enumerate(lp):
        if w == 0.0:
            l1 = l0
        out.append((schedule.dists[k], l0, l1, w, schedule.diameters[k]))
    return out


def _fwd_kernel(plan, dims, c, world_size, max_alpha, occlusion_falloff,
                *refs):
    nl = len(dims)
    start_ref, dir_ref = refs[0], refs[1]
    zsum_refs = refs[2:2 + nl]
    level_refs = refs[2 + nl:2 + 2 * nl]
    color_ref, occ_ref, alpha_ref = refs[2 + 2 * nl:]

    s = start_ref[:]
    dvec = dir_ref[:]
    p = s.shape[0]
    t = jnp.ones((p, 1), jnp.float32)
    color = jnp.zeros((p, 3), jnp.float32)
    occ = jnp.zeros((p, 1), jnp.float32)
    for dist, l0, l1, w, diam in plan:
        pos = s + dist * dvec
        smp = _sample_level(level_refs[l0], zsum_refs[l0], pos, dims[l0], c,
                            world_size)
        if l1 != l0:
            smp1 = _sample_level(level_refs[l1], zsum_refs[l1], pos,
                                 dims[l1], c, world_size)
            smp = smp * (1.0 - w) + smp1 * w
        a = smp[:, 3:4]
        active = (1.0 - t) < max_alpha
        wgt = jnp.where(active, t, 0.0)
        color = color + wgt * smp[:, :3]
        occ = occ + wgt * a / (1.0 + occlusion_falloff * diam)
        t = jnp.where(active, t * (1.0 - a), t)
    color_ref[:] = color
    occ_ref[:] = occ
    alpha_ref[:] = 1.0 - t


def _bwd_kernel(plan, dims, c, world_size, max_alpha, occlusion_falloff,
                *refs):
    """Recompute-forward + reverse recursion; accumulates level cotangents.

    With u_k = dL/dT_{k+1}, the recursion backward over steps is
        dL/da_k = active_k * T_k * (gocc/atten_k - u_k)
        u_{k-1} = active_k * (c_k.gcol + a_k gocc/atten_k + (1-a_k) u_k)
                  + (1-active_k) u_k
    (no divisions, so fully-opaque samples a == 1 differentiate correctly).
    Level grads: dT += Wxy^T @ ((dsmp @ zsum^T) * wz) — the transposed
    interpolation matmul, accumulated across sequential grid programs.
    """
    nl = len(dims)
    start_ref, dir_ref, gcol_ref, gocc_ref, galpha_ref = refs[:5]
    zsum_refs = refs[5:5 + nl]
    zsumt_refs = refs[5 + nl:5 + 2 * nl]
    level_refs = refs[5 + 2 * nl:5 + 3 * nl]
    dlevel_refs = refs[5 + 3 * nl:]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in dlevel_refs:
            r[:] = jnp.zeros(r.shape, jnp.float32)

    s = start_ref[:]
    dvec = dir_ref[:]
    p = s.shape[0]
    gcol = gcol_ref[:]
    gocc = gocc_ref[:]
    galpha = galpha_ref[:]

    # pass 1: recompute per-step transmittance weight / alpha / color
    t = jnp.ones((p, 1), jnp.float32)
    wgts, alphas, cols = [], [], []
    for dist, l0, l1, w, diam in plan:
        pos = s + dist * dvec
        smp = _sample_level(level_refs[l0], zsum_refs[l0], pos, dims[l0], c,
                            world_size)
        if l1 != l0:
            smp1 = _sample_level(level_refs[l1], zsum_refs[l1], pos,
                                 dims[l1], c, world_size)
            smp = smp * (1.0 - w) + smp1 * w
        a = smp[:, 3:4]
        active = (1.0 - t) < max_alpha
        wgts.append(jnp.where(active, t, 0.0))
        alphas.append(a)
        cols.append(smp[:, :3])
        t = jnp.where(active, t * (1.0 - a), t)

    # pass 2: reverse recursion + transposed-matmul scatter
    u = -galpha                                     # dL/dT_end; alpha = 1-T
    for i in range(len(plan) - 1, -1, -1):
        dist, l0, l1, w, diam = plan[i]
        atten = 1.0 + occlusion_falloff * diam
        wgt, a, crgb = wgts[i], alphas[i], cols[i]
        active = wgt > 0.0
        da = wgt * (gocc / atten - u)
        dc = wgt * gcol
        u = jnp.where(
            active,
            jnp.sum(crgb * gcol, axis=-1, keepdims=True)
            + a * gocc / atten + (1.0 - a) * u,
            u)
        dsmp = jnp.concatenate([dc, da], axis=-1)   # (P, 4)
        pos = s + dist * dvec
        pairs = ((l0, 1.0 - w), (l1, w)) if l1 != l0 else ((l0, 1.0),)
        for lvl, lw in pairs:
            d = dims[lvl]
            wxy, wz = _trilin_weights(pos, d, c, world_size)
            ds = jnp.dot(dsmp * lw, zsumt_refs[lvl][:],
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)    # (P, D*C)
            # Wxy^T @ (ds*wz) without materializing the transpose
            dlevel_refs[lvl][:] += jax.lax.dot_general(
                wxy, ds * wz, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)


def _level_tables(mips: Sequence[Array]):
    c = mips[0].shape[-1]
    tables = []
    for m in mips:
        d = m.shape[0]
        tables.append(m.reshape(d * d, d * c).astype(jnp.float32))
    return tuple(tables)


@functools.lru_cache(maxsize=None)
def _build(dims: Tuple[int, ...], c: int, schedule: M.MarchSchedule,
           world_size: float, max_alpha: float, occlusion_falloff: float):
    """Factory: a custom-VJP cone march for static (dims, schedule, ...)."""
    plan = _plan(schedule, len(dims))
    zsums = tuple(jnp.asarray(_zsum(d, c)) for d in dims)
    zsum_ts = tuple(jnp.asarray(_zsum(d, c).T) for d in dims)

    def tile_spec(width):
        return pl.BlockSpec((_TILE, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def whole(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    def fwd(tables, start, dirs):
        n = start.shape[0]
        kern = functools.partial(_fwd_kernel, plan, dims, c, world_size,
                                 max_alpha, occlusion_falloff)
        color, occ, alpha = pl.pallas_call(
            kern,
            grid=(n // _TILE,),
            in_specs=[tile_spec(3), tile_spec(3)]
            + [whole(z.shape) for z in zsums]
            + [whole(t.shape) for t in tables],
            out_specs=(tile_spec(3), tile_spec(1), tile_spec(1)),
            out_shape=(
                jax.ShapeDtypeStruct((n, 3), jnp.float32),
                jax.ShapeDtypeStruct((n, 1), jnp.float32),
                jax.ShapeDtypeStruct((n, 1), jnp.float32),
            ),
            interpret=_interpret(),
        )(start, dirs, *zsums, *tables)
        return color, occ[:, 0], alpha[:, 0]

    @jax.custom_vjp
    def march(tables, start, dirs):
        return fwd(tables, start, dirs)

    def march_fwd(tables, start, dirs):
        return fwd(tables, start, dirs), (tables, start, dirs)

    def march_bwd(res, g):
        tables, start, dirs = res
        gcol, gocc, galpha = g
        n = start.shape[0]
        kern = functools.partial(_bwd_kernel, plan, dims, c, world_size,
                                 max_alpha, occlusion_falloff)
        dtables = pl.pallas_call(
            kern,
            grid=(n // _TILE,),
            in_specs=[tile_spec(3), tile_spec(3), tile_spec(3),
                      tile_spec(1), tile_spec(1)]
            + [whole(z.shape) for z in zsums]
            + [whole(z.shape) for z in zsum_ts]
            + [whole(t.shape) for t in tables],
            out_specs=tuple(whole(t.shape) for t in tables),
            out_shape=tuple(
                jax.ShapeDtypeStruct(t.shape, jnp.float32) for t in tables),
            interpret=_interpret(),
        )(start, dirs, gcol, gocc[:, None], galpha[:, None],
          *zsums, *zsum_ts, *tables)
        return (tuple(dtables), jnp.zeros_like(start), jnp.zeros_like(dirs))

    march.defvjp(march_fwd, march_bwd)
    return march


def cone_march_pallas(
    mips: Sequence[Array],
    start: Array,                     # (N, 3) pre-offset origins
    direction: Array,                 # (N, 3) unit directions
    schedule: M.MarchSchedule,
    world_size: float,
    max_alpha: float = 0.95,
    occlusion_falloff: float = 0.03,
) -> Tuple[Array, Array, Array]:
    """Pallas cone_march (see module header). Returns (color, occ, alpha).

    Oracle: core/march.py cone_march — allclose-tested forward and
    pyramid-gradient in tests/test_ops_pallas.py.
    """
    if schedule.step_factor != 1.0:
        raise NotImplementedError("pallas kernel requires step_factor == 1")
    if mips[0].ndim != 4:
        raise NotImplementedError("pallas kernel is isotropic-only")
    if mips[0].shape[0] > _MAX_VMEM_DIM:
        raise ValueError(
            f"pyramid dim {mips[0].shape[0]} > {_MAX_VMEM_DIM}: use the "
            "direction-major dense march (core/dense.py) at this scale")
    if schedule.num_steps == 0:
        n = start.shape[0]
        z = jnp.zeros((n,), jnp.float32)
        return jnp.zeros((n, 3), jnp.float32), z, z

    dims = tuple(m.shape[0] for m in mips)
    c = mips[0].shape[-1]
    tables = _level_tables(mips)
    march = _build(dims, c, schedule, float(world_size), float(max_alpha),
                   float(occlusion_falloff))

    n = start.shape[0]
    pad = (-n) % _TILE
    if pad:
        start = jnp.concatenate(
            [start, jnp.zeros((pad, 3), start.dtype)])
        direction = jnp.concatenate(
            [direction, jnp.ones((pad, 3), direction.dtype)])
    color, occ, alpha = march(tables, start.astype(jnp.float32),
                              direction.astype(jnp.float32))
    return color[:n], occ[:n], alpha[:n]
