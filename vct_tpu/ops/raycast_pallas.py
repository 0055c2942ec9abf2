"""Pallas pinhole raycast: closest-hit + G-buffer interpolation in VMEM.

Replaces render/gbuffer.py's XLA pinhole path for the camera pass.  The XLA
path is bandwidth-bound: each 65k-ray chunk materializes (N, T) f32
intermediates in HBM (det/ud/vd/valid/t ~ 1.8 GB per chunk) and then pays
~14M gather rows for the winner's attributes (pc.b[tri], vn[tri], ...)
— measured 376 ms/frame at 1080p x 1122 triangles (scripts/profile_frame.py).

Here one kernel per 256-ray tile keeps every (N, T) intermediate in VMEM
and fetches the winner's attributes with a ONE-HOT MATMUL on the MXU
((tile, T) winner mask @ (T, 40) attribute table), so the only HBM traffic
is rays in (12 B/ray) and the finished G-buffer out (96 B/ray).

Math identical to gbuffer._intersect_chunk_pinhole (Möller–Trumbore with
the shared origin folded into per-triangle constants; conditions multiplied
through by |det|) and gbuffer._interp_gbuffer (barycentric attribute
interpolation).  Replaces VoxelConeTracing.vs:25-36 + the hardware raster
(SURVEY.md §7.1).

Geometry is not differentiated through this kernel (the reference's
rasterizer isn't differentiable either); the XLA path remains for
camera/geometry-gradient experiments.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vct_tpu.render.gbuffer import DeviceScene, GBuffer

Array = jax.Array

TILE = 256              # rays per kernel instance
TCHUNK = 1024           # max triangles per inner-loop chunk (VMEM working set)


def _chunk_size(tp: int) -> int:
    """Triangles per inner iteration: one chunk when the table is small
    (avoids padding 1.1k triangles up to 2k), else TCHUNK."""
    return tp if tp <= 2 * TCHUNK else TCHUNK
NATTR = 48              # vn9 vt9 vb9 uv6 fn3 mat1 albedo4 spec3 -> pad 48
NOUT = 32               # pos3 n3 gn3 t3 b3 uv2 mat1 t1 hit1 alb4 spec3 -> 32
_BIG = 3.0e38           # ~f32 max: "no hit" sentinel that survives arithmetic


def pack_tables(ds: DeviceScene, origin: Array,
                albedo: Optional[Array] = None,
                specular: Optional[Array] = None
                ) -> Tuple[Array, Array, int]:
    """Per-triangle tables for a fixed ray origin.

    Returns (isect (16, Tp), attrs (Tp, NATTR), T) with Tp padded to a
    TCHUNK multiple.  isect rows: 0:3 a (det = d.a), 3:6 b (u*det = d.b),
    6:9 c (v*det = d.c), 9 k (t*det = e2.c), rest zero.  Padding columns
    have a = 0 so det = 0 -> invalid.  attrs columns: vn(9) vt(9) vb(9)
    uv(6) face_normal(3) material(1) albedo(4) specular(3), zero-padded.
    albedo (M, 4) / specular (M, 3) are per-MATERIAL constants expanded to
    per-triangle rows, so flat-colored scenes shade with zero gathers.
    """
    t = ds.v0.shape[0]
    tvec = origin[None, :] - ds.v0
    c = jnp.cross(tvec, ds.e1)
    a = jnp.cross(ds.e2, ds.e1)
    b = jnp.cross(ds.e2, tvec)
    k = jnp.sum(ds.e2 * c, axis=-1, keepdims=True)
    isect = jnp.concatenate(
        [a, b, c, k, jnp.zeros((t, 6), a.dtype)], axis=-1)     # (T, 16)

    alb = (albedo[ds.material] if albedo is not None
           else jnp.zeros((t, 4), jnp.float32))
    spec = (specular[ds.material] if specular is not None
            else jnp.zeros((t, 3), jnp.float32))
    attrs = jnp.concatenate([
        ds.vn.reshape(t, 9),
        ds.vt.reshape(t, 9),
        ds.vb.reshape(t, 9),
        ds.vuv.reshape(t, 6),
        ds.face_normal,
        ds.material.astype(jnp.float32)[:, None],
        alb,
        spec,
        jnp.zeros((t, NATTR - 44), jnp.float32),
    ], axis=-1)                                                # (T, NATTR)

    tp128 = -(-t // 128) * 128                 # lane-aligned triangle count
    tp = tp128 if tp128 <= 2 * TCHUNK else -(-t // TCHUNK) * TCHUNK
    pad = tp - t
    if pad:
        isect = jnp.concatenate(
            [isect, jnp.zeros((pad, 16), isect.dtype)], axis=0)
        attrs = jnp.concatenate(
            [attrs, jnp.zeros((pad, NATTR), attrs.dtype)], axis=0)
    return isect.T, attrs, t


def _kernel(dirs_ref, o_ref, isect_ref, attrs_ref, out_ref, *, tp: int,
            eps: float, tmin_eps: float):
    """One TILE of rays vs all triangles (fori over triangle chunks)."""
    d = dirs_ref[...]                       # (TILE, 3) f32
    tc = _chunk_size(tp)
    nchunk = tp // tc

    def chunk(ci, carry):
        tbest, gbest = carry                # (TILE,1), (TILE,NATTR+3)
        base = pl.multiple_of(ci * tc, tc)
        blk = isect_ref[:, pl.ds(base, tc)]           # (16, tc)
        at = attrs_ref[pl.ds(base, tc), :]            # (tc, NATTR)
        kk = blk[9:10, :]
        # det/u*det/v*det for all (ray, tri) pairs: three K=3 contractions
        # on the MXU instead of 15 VPU broadcast ops per element
        def dot3(rows):
            return jax.lax.dot_general(
                d, rows, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        det = dot3(blk[0:3, :])
        ud = dot3(blk[3:6, :])
        vd = dot3(blk[6:9, :])
        s = jnp.sign(det)
        ad = jnp.abs(det)
        sk = s * kk
        valid = ((ad > eps) & (s * ud >= 0) & (s * vd >= 0)
                 & (s * (ud + vd) <= ad) & (sk > tmin_eps * ad))
        tval = sk / jnp.maximum(ad, eps)
        tcand = jnp.where(valid, tval, _BIG)          # (TILE, TCHUNK)

        # first-min winner within the chunk (argmin semantics)
        tmin_c = jnp.min(tcand, axis=1, keepdims=True)             # (TILE,1)
        lanes = jax.lax.broadcasted_iota(jnp.int32, tcand.shape, 1)
        idx_c = jnp.min(jnp.where(tcand == tmin_c, lanes, tp),
                        axis=1, keepdims=True)
        onehot = ((lanes == idx_c) & (tmin_c < _BIG)).astype(jnp.float32)

        # winner's u, v and attribute row via the one-hot
        inv = 1.0 / jnp.maximum(ad, eps)
        u_c = jnp.sum(onehot * ud * s * inv, axis=1, keepdims=True)
        v_c = jnp.sum(onehot * vd * s * inv, axis=1, keepdims=True)
        arow = jax.lax.dot_general(
            onehot, at, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (TILE, NATTR)
        gcand = jnp.concatenate([u_c, v_c, jnp.zeros_like(u_c), arow],
                                axis=1)               # (TILE, NATTR+3)

        better = tmin_c < tbest
        return (jnp.where(better, tmin_c, tbest),
                jnp.where(better, gcand, gbest))

    tbest0 = jnp.full((TILE, 1), _BIG, jnp.float32)
    gbest0 = jnp.zeros((TILE, NATTR + 3), jnp.float32)
    tbest, g = jax.lax.fori_loop(0, nchunk, chunk, (tbest0, gbest0))

    # interpolate the G-buffer (gbuffer._interp_gbuffer semantics)
    hit = tbest < _BIG
    ts = jnp.where(hit, tbest, 0.0)                   # (TILE, 1)
    u = g[:, 0:1]
    v = g[:, 1:2]
    w0 = 1.0 - u - v
    vn = g[:, 3:12]
    vt = g[:, 12:21]
    vb = g[:, 21:30]
    vuv = g[:, 30:36]
    fn = g[:, 36:39]
    mat = g[:, 39:40]
    alb = g[:, 40:44]
    spec = g[:, 44:47]

    def interp3(a9):
        return w0 * a9[:, 0:3] + u * a9[:, 3:6] + v * a9[:, 6:9]

    normal = interp3(vn)
    nrm = jax.lax.rsqrt(jnp.maximum(
        jnp.sum(normal * normal, axis=1, keepdims=True), 1e-24))
    normal = normal * nrm
    tangent = interp3(vt)
    bitan = interp3(vb)
    uv = w0 * vuv[:, 0:2] + u * vuv[:, 2:4] + v * vuv[:, 4:6]

    o = o_ref[0:1, :]                                 # (1, 3)
    pos = o + ts * d
    out = jnp.concatenate([
        pos, normal, fn, tangent, bitan, uv, mat, ts,
        hit.astype(jnp.float32), alb, spec,
        jnp.zeros((TILE, NOUT - 27), jnp.float32),
    ], axis=1)
    out_ref[...] = out


@functools.partial(jax.jit, static_argnames=("interpret",))
def raycast_gbuf24(dirs: Array, origin: Array, isect: Array, attrs: Array,
                   interpret: bool = False) -> Array:
    """(N, 3) same-origin rays -> (N, NOUT) packed G-buffer.

    N must be a multiple of TILE; isect/attrs from pack_tables.
    Columns: 0:3 position, 3:6 shading normal, 6:9 geo normal, 9:12 tangent,
    12:15 bitangent, 15:17 uv, 17 material (f32), 18 t, 19 hit,
    20:24 material albedo, 24:27 material specular.
    """
    n = dirs.shape[0]
    assert n % TILE == 0, n
    tp = isect.shape[1]
    assert tp % _chunk_size(tp) == 0, tp
    kern = functools.partial(_kernel, tp=tp, eps=1e-7, tmin_eps=1e-4)
    grid = (n // TILE,)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, tp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tp, NATTR), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, NOUT), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, NOUT), jnp.float32),
        interpret=interpret,
    )(dirs, origin[None, :], isect, attrs)


def gbuf24_to_gbuffer(g: Array) -> GBuffer:
    """Unpack the (N, NOUT) kernel output into the GBuffer pytree."""
    return GBuffer(
        hit=g[..., 19] > 0.5,
        t=g[..., 18],
        position=g[..., 0:3],
        normal=g[..., 3:6],
        geo_normal=g[..., 6:9],
        tangent=g[..., 9:12],
        bitangent=g[..., 12:15],
        uv=g[..., 15:17],
        material=g[..., 17].astype(jnp.int32),
        tri=jnp.zeros(g.shape[:-1], jnp.int32),   # not tracked by the kernel
    )


def raycast_pinhole_pallas(ds: DeviceScene, origin: Array, dirs: Array,
                           interpret: bool = False) -> GBuffer:
    """Drop-in closest-hit G-buffer for same-origin rays of any batch shape."""
    shape = dirs.shape[:-1]
    d = dirs.reshape(-1, 3)
    n = d.shape[0]
    pad = (-n) % TILE
    if pad:
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
    isect, attrs, _ = pack_tables(ds, origin)
    g = raycast_gbuf24(d, origin, isect, attrs, interpret=interpret)
    g = g[:n].reshape(shape + (NOUT,))
    return gbuf24_to_gbuffer(g)
