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
NATTR = 48              # vn9 vt9 vb9 uv6 fn3 mat1 alb4 spec3 shin1 -> 48
NOUT = 32               # pos3 n3 gn3 t3 b3 uv2 mat1 t1 hit1 alb4 spec3 shin1 -> 32
_BIG = 3.0e38           # ~f32 max: "no hit" sentinel that survives arithmetic


def pack_tables(ds: DeviceScene, origin: Array,
                albedo: Optional[Array] = None,
                specular: Optional[Array] = None,
                shininess: Optional[Array] = None
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
    shin = (shininess[ds.material] if shininess is not None
            else jnp.full((t,), 20.0, jnp.float32))
    attrs = jnp.concatenate([
        ds.vn.reshape(t, 9),
        ds.vt.reshape(t, 9),
        ds.vb.reshape(t, 9),
        ds.vuv.reshape(t, 6),
        ds.face_normal,
        ds.material.astype(jnp.float32)[:, None],
        alb,
        spec,
        shin[:, None],
        jnp.zeros((t, NATTR - 45), jnp.float32),
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
        # det/u*det/v*det for all (ray, tri) pairs: exact-f32 K=3
        # contractions as VPU broadcast multiply-adds.  EXACT f32 is
        # load-bearing: the origin-folded constants make u*det/v*det
        # small differences of ~100x-larger products, and the MXU's
        # default bf16 passes flip `valid` for thin/grazing triangles
        # (r5 finding: 10% of 1080p pixels at 287k tris disagreed with
        # the f32 oracle); Precision.HIGHEST fixes that but measured
        # ~6x slower than these 5 elementwise ops per contraction.
        def dot3(r0):
            return (d[:, 0:1] * blk[r0:r0 + 1, :]
                    + d[:, 1:2] * blk[r0 + 1:r0 + 2, :]
                    + d[:, 2:3] * blk[r0 + 2:r0 + 3, :])
        det = dot3(0)
        ud = dot3(3)
        vd = dot3(6)
        s = jnp.sign(det)
        ad = jnp.abs(det)
        sk = s * kk
        inv = 1.0 / jnp.maximum(ad, eps)
        sinv = s * inv
        valid = ((ad > eps) & (s * ud >= 0) & (s * vd >= 0)
                 & (s * (ud + vd) <= ad) & (sk > tmin_eps * ad))
        tval = kk * sinv
        tcand = jnp.where(valid, tval, _BIG)          # (TILE, TCHUNK)

        # first-min winner within the chunk (argmin semantics)
        tmin_c = jnp.min(tcand, axis=1, keepdims=True)             # (TILE,1)
        lanes = jax.lax.broadcasted_iota(jnp.int32, tcand.shape, 1)
        idx_c = jnp.min(jnp.where(tcand == tmin_c, lanes, tp),
                        axis=1, keepdims=True)
        onehot = ((lanes == idx_c) & (tmin_c < _BIG)).astype(jnp.float32)

        # winner's u, v and attribute row via the one-hot
        u_c = jnp.sum(onehot * (ud * sinv), axis=1, keepdims=True)
        v_c = jnp.sum(onehot * (vd * sinv), axis=1, keepdims=True)
        arow = jax.lax.dot_general(
            onehot, at, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)      # (TILE, NATTR)
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
    shin = g[:, 47:48]

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
        hit.astype(jnp.float32), alb, spec, shin,
        jnp.zeros((TILE, NOUT - 28), jnp.float32),
    ], axis=1)
    out_ref[...] = out


def raycast_ref(dirs: Array, origin: Array, isect: Array,
                attrs: Array, eps: float = 1e-7,
                tmin_eps: float = 1e-4) -> Array:
    """Pure-jnp mirror of the raycast kernels (same packed-table math,
    same first-min winner), O(N x Tp) memory — the differentiable
    linearization point for their custom VJP and a test oracle.  Output
    layout identical to raycast_gbuf24."""
    d = dirs
    blk = isect                                    # (16, Tp)
    tp = blk.shape[1]
    hi = jax.lax.Precision.HIGHEST

    # the EXACT same f32 expression as the kernels' dot3 (matmul would
    # round differently and flip winners on near-ties; see _kernel)
    def dot3(r0):
        return (d[:, 0:1] * blk[r0:r0 + 1, :]
                + d[:, 1:2] * blk[r0 + 1:r0 + 2, :]
                + d[:, 2:3] * blk[r0 + 2:r0 + 3, :])
    det = dot3(0)
    ud = dot3(3)
    vd = dot3(6)
    kk = blk[9:10]
    s = jnp.sign(det)
    ad = jnp.abs(det)
    sk = s * kk
    inv = 1.0 / jnp.maximum(ad, eps)
    sinv = s * inv
    valid = ((ad > eps) & (s * ud >= 0) & (s * vd >= 0)
             & (s * (ud + vd) <= ad) & (sk > tmin_eps * ad))
    tval = kk * sinv
    tcand = jnp.where(valid, tval, _BIG)
    tbest = jnp.min(tcand, axis=1, keepdims=True)
    lanes = jnp.arange(tp)[None, :]
    idx = jnp.min(jnp.where(tcand == tbest, lanes, tp), axis=1,
                  keepdims=True)
    onehot = ((lanes == idx) & (tbest < _BIG)).astype(jnp.float32)
    u_c = jnp.sum(onehot * (ud * sinv), axis=1, keepdims=True)
    v_c = jnp.sum(onehot * (vd * sinv), axis=1, keepdims=True)
    arow = jnp.matmul(onehot, attrs, precision=hi)  # (N, NATTR)
    g = jnp.concatenate([u_c, v_c, jnp.zeros_like(u_c), arow], axis=1)

    class _Ref:                                    # mimic o_ref[0:1, :]
        def __init__(self, o):
            self.o = o

        def __getitem__(self, sl):
            return self.o[None, :]

    return _finish_gbuf(d, _Ref(origin), tbest, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _raycast_call(dirs, origin, isect, attrs, interpret):
    return _raycast_pallas(dirs, origin, isect, attrs, interpret)


def _raycast_fwd(dirs, origin, isect, attrs, interpret):
    out = _raycast_pallas(dirs, origin, isect, attrs, interpret)
    return out, (dirs, origin, isect, attrs)


BWD_CHUNK = 8192    # rays per backward-replay chunk (see _raycast_bwd)


def _raycast_bwd(interpret, res, bar):
    """Gradients to the ATTRIBUTE table (linear: one-hot winner fetch,
    interpolation, normalization — all differentiable through the jnp
    ref).  Geometry inputs (dirs/origin/isect) get zero cotangents: hit
    topology is a step function, matching the reference's
    non-differentiable rasterizer (VoxelConeTracing.vs + hardware raster).

    The replay materializes (chunk, Tp) f32 intermediates; CHUNKING over
    rays (lax.scan over BWD_CHUNK blocks, dattrs accumulated — gradients
    are additive over rays) bounds peak memory at ~8 x BWD_CHUNK x Tp x 4
    bytes regardless of image size, so a 1080p inverse run cannot hit the
    r4 memory cliff (VERDICT r4 item 8).  Per-chunk == whole-batch is
    exact (each ray's contribution is independent);
    tests/test_raycast_pallas.py covers the equality.
    """
    dirs, origin, isect, attrs = res
    n = dirs.shape[0]
    if n <= BWD_CHUNK:
        _, vjp = jax.vjp(lambda at: raycast_ref(dirs, origin, isect, at),
                         attrs)
        (dattrs,) = vjp(bar)
    else:
        pad = (-n) % BWD_CHUNK
        d2 = (jnp.concatenate([dirs, jnp.ones((pad, 3), dirs.dtype)])
              if pad else dirs)
        b2 = (jnp.concatenate(
            [bar, jnp.zeros((pad, bar.shape[1]), bar.dtype)])
            if pad else bar)      # zero cotangent -> pad rays contribute 0

        def body(acc, xs):
            dc, bc = xs
            _, vjp = jax.vjp(
                lambda at: raycast_ref(dc, origin, isect, at), attrs)
            (da,) = vjp(bc)
            return acc + da, None

        dattrs, _ = jax.lax.scan(
            body, jnp.zeros_like(attrs),
            (d2.reshape(-1, BWD_CHUNK, 3),
             b2.reshape(-1, BWD_CHUNK, b2.shape[1])))
    return (jnp.zeros_like(dirs), jnp.zeros_like(origin),
            jnp.zeros_like(isect), dattrs)


_raycast_call.defvjp(_raycast_fwd, _raycast_bwd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def raycast_gbuf24(dirs: Array, origin: Array, isect: Array, attrs: Array,
                   interpret: bool = False) -> Array:
    """Differentiable wrapper: forward is the Pallas kernel, reverse-mode
    gradients reach `attrs` (material colors / shading attributes) via
    raycast_ref's VJP; see raycast_ref/_raycast_bwd."""
    return _raycast_call(dirs, origin, isect, attrs, interpret)


def _raycast_pallas(dirs: Array, origin: Array, isect: Array, attrs: Array,
                    interpret: bool = False) -> Array:
    """(N, 3) same-origin rays -> (N, NOUT) packed G-buffer.

    N must be a multiple of TILE; isect/attrs from pack_tables.
    Columns: 0:3 position, 3:6 shading normal, 6:9 geo normal, 9:12 tangent,
    12:15 bitangent, 15:17 uv, 17 material (f32), 18 t, 19 hit,
    20:24 material albedo, 24:27 material specular, 27 shininess.
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


# ---------------------------------------------------------------------------
# Streamed raycast: triangle chunks DMA'd HBM -> VMEM with per-tile
# cone-vs-sphere chunk culling — primary visibility sublinear in triangle
# count, Sponza-scale (Model.h:43, Voxel_Cone_Tracing.h:77).
#
# The scene's triangles are Morton-sorted (gbuffer.DeviceScene), so CHUNK-
# sized runs are spatially compact; an XLA prepass bounds each chunk with a
# sphere and each 256-ray tile with a direction cone (shared pinhole
# origin), keeps chunks whose sphere touches the cone (conservative — the
# kernel's output matches brute force except tie-breaking on exact-equal
# t across chunks, which follows near-sorted list order), and compacts the
# surviving chunk ids into per-tile lists.  The kernel streams each tile's
# listed chunks through double-buffered VMEM scratch with a dynamic-bound
# fori, computing exactly the whole-table kernel's math per chunk.
# ---------------------------------------------------------------------------

CHUNK = 128             # triangles per streamed chunk (the lane-tile
                        # minimum): r4 sweep at 287k tris — 512: 448 ms,
                        # 256: 272, 128: 216 — tighter chunk spheres cull
                        # ~3x more triangles and the GANG batching keeps
                        # the loop wide
GANG = 8                # chunks per kernel loop iteration: the per-chunk
                        # compute is a ~20-op dependent chain at ~0.12 us/op
                        # (r4), so processing GANG*CHUNK triangles per
                        # iteration halves the chain count per surviving
                        # chunk without coarsening the 512-tri culling


def pack_tables_stream(ds: DeviceScene, origin: Array,
                       albedo: Optional[Array] = None,
                       specular: Optional[Array] = None,
                       shininess: Optional[Array] = None
                       ) -> Tuple[Array, Array, Array, int]:
    """Streaming tables: (isect (16, Tp), attrsT (NATTR, Tp),
    spheres (nchunk, 4), T) with Tp a CHUNK multiple.

    isect/attrs as pack_tables (same per-triangle constants); attrs is
    TRANSPOSED so a chunk slice is lane-aligned (the NATTR dim is not a
    128-multiple, so it cannot be the lane dim of a sliced DMA).  spheres
    rows are (center - origin, radius) per chunk — radius -inf for chunks
    that are all padding, so they cull everywhere.
    """
    isect_t, attrs, t = pack_tables(ds, origin, albedo, specular,
                                    shininess)
    isect = isect_t.T                              # (Tp0, 16)
    tp0 = isect.shape[0]
    tp = -(-tp0 // CHUNK) * CHUNK
    if tp > tp0:
        isect = jnp.concatenate(
            [isect, jnp.zeros((tp - tp0, 16), isect.dtype)], axis=0)
        attrs = jnp.concatenate(
            [attrs, jnp.zeros((tp - tp0, NATTR), attrs.dtype)], axis=0)
    nchunk = tp // CHUNK

    # chunk bounding spheres over the REAL triangles' corners
    v0 = ds.v0
    verts = jnp.concatenate([v0, v0 + ds.e1, v0 + ds.e2], axis=1)  # (T, 9)
    pad = tp - t
    if pad:
        verts = jnp.concatenate(
            [verts, jnp.zeros((pad, 9), verts.dtype)], axis=0)
    real = (jnp.arange(tp) < t)[:, None]
    big = jnp.float32(_BIG)
    vmin = jnp.min(jnp.where(real, verts, big).reshape(nchunk, CHUNK, 3, 3),
                   axis=(1, 2))
    vmax = jnp.max(jnp.where(real, verts, -big).reshape(nchunk, CHUNK, 3, 3),
                   axis=(1, 2))
    any_real = jnp.any(real.reshape(nchunk, CHUNK), axis=1)
    center = jnp.where(any_real[:, None], 0.5 * (vmin + vmax), 0.0)
    radius = jnp.where(
        any_real, jnp.linalg.norm(
            jnp.where(any_real[:, None], vmax - center, 0.0), axis=1), -big)
    spheres = jnp.concatenate(
        [center - origin[None, :], radius[:, None]], axis=1)
    return isect.T, attrs.T, spheres, t


def select_chunks(dirs: Array, spheres: Array) -> Tuple[Array, Array]:
    """Per-ray-tile chunk lists: dirs (nrt, TILE, 3) unit directions,
    spheres (nchunk, 4) origin-relative -> (lists (nrt, nchunk) int32,
    counts (nrt,) int32).

    Tile bounding cone: axis = normalized mean direction, cos half-angle =
    min ray dot (exact for the tile since min-dot over a convex direction
    set is attained on it).  Sphere-vs-cone (Lengyel): cull when the signed
    distance cosA*perp - sinA*along exceeds r, or the sphere is entirely
    behind the apex — both conservative, so the streamed kernel's winner
    set is a superset of every ray's true hits.
    """
    nrt, _, _ = dirs.shape
    nchunk = spheres.shape[0]
    axis = jnp.sum(dirs, axis=1)
    axis = axis / jnp.maximum(
        jnp.linalg.norm(axis, axis=1, keepdims=True), 1e-12)
    # f32-exact contractions: the TPU's default bf16 matmul precision
    # puts ~0.4-unit errors on `along` for far chunks, enough to miscull
    # chunks that marginally touch the cone (r5 finding — the same class
    # of bug as the kernel dot3s; see _kernel)
    min_dot = jnp.min(jnp.sum(dirs * axis[:, None, :], axis=2), axis=1)
    cos_a = jnp.clip(min_dot, 1e-4, 1.0)                        # (nrt,)
    sin_a = jnp.sqrt(jnp.maximum(1.0 - cos_a * cos_a, 0.0))
    wide = min_dot <= 1e-4   # no valid bounding cone -> keep-all below
    v = spheres[:, :3]                                          # (nchunk, 3)
    r = spheres[:, 3]
    along = jnp.matmul(axis, v.T,
                       precision=jax.lax.Precision.HIGHEST)     # (nrt, nchunk)
    vv = jnp.sum(v * v, axis=1)[None, :]
    perp = jnp.sqrt(jnp.maximum(vv - along * along, 0.0))
    dist = cos_a[:, None] * perp - sin_a[:, None] * along
    keep = (dist <= r[None, :]) & (along >= -r[None, :])
    # a tile whose rays spread to (or past) ~90 degrees from the mean axis
    # has no valid bounding cone — keep every chunk rather than cull
    # wrongly.  The threshold matches the cos_a clip floor so the clip can
    # never NARROW the cone of a kept tile (pinhole tiles never hit this;
    # ADVICE r3/r4).
    keep = keep | wide[:, None]
    counts = jnp.sum(keep, axis=1).astype(jnp.int32)

    # FRONT-TO-BACK: surviving chunks sorted by conservative near
    # distance (|c| - r, floored to int and packed into bits 16..30 of
    # the list word) so the kernel can STOP once every ray's best hit is
    # closer than the next chunk's near bound — the voxel-cone analogue
    # of front-to-back traversal with occlusion termination.
    near = jnp.maximum(jnp.sqrt(jnp.maximum(vv, 0.0)) - r[None, :], 0.0)
    near_q = jnp.clip(jnp.floor(near), 0, 32766).astype(jnp.int32)
    # VALUE-sort the packed (near | id) words directly: sorting by the
    # word IS sorting by (near, id), and it avoids the argsort + gather
    # pair, which measured 207 ms vs 15 ms at 1080p x 2248 chunks (r4).
    # Culled entries carry the int32-max sentinel 0x7FFFFFFF: the largest
    # real word is (32766 << 16) | 0xFFFF = 0x7FFEFFFF, so culled entries
    # always sort AFTER every kept chunk (a 2^30 sentinel did not — a kept
    # chunk with near_q >= 16384 packed above it and sentinels leaked into
    # the counted prefix; ADVICE r4).  The sentinel's near bits (32767)
    # also make the kernel's stop check fire if it ever peeks past the
    # count.
    cis = jnp.broadcast_to(jnp.arange(nchunk, dtype=jnp.int32)[None, :],
                           (nrt, nchunk))
    words = jnp.where(keep, cis | (near_q << 16), jnp.int32(0x7FFFFFFF))
    sorted_words = jnp.sort(words, axis=1)
    # lane dim padded to a 128-multiple: the kernel DMAs one lists row per
    # tile, and Mosaic requires 128-aligned lane extents on sliced copies
    ncp = -(-nchunk // 128) * 128
    lists = jnp.full((nrt, ncp), jnp.int32(0x7FFFFFFF)).at[
        :, :nchunk].set(sorted_words)
    pad_r = (-nrt) % 8       # kernel copies 8-row groups (sublane-aligned)
    if pad_r:
        lists = jnp.concatenate(
            [lists, jnp.zeros((pad_r, ncp), jnp.int32)], axis=0)
    return lists, counts


def _stream_kernel(scal_ref,               # (1+GANG, nrt) int32 prefetch
                   dirs_ref, o_ref, tfar_ref, tmin_ref, lists_ref,
                   isect_ref, attrsT_ref,
                   out_ref, listbuf, tb_ref, gb_ref,
                   ibuf, abuf, lsem, isem, asem,
                   *, nchunk: int, eps: float, tmin_eps: float):
    d = dirs_ref[...]                       # (TILE, 3)
    tmn = tmin_ref[...]                     # (TILE, 1) per-ray min hit t
                                            # (alpha-mask re-cast; -1 = off)
    i = pl.program_id(0)
    cnt = scal_ref[0, i]
    gw = GANG * CHUNK

    def member_dma(ci, slot, m):
        # each gang member owns a leading-indexed buffer block (partial
        # trailing-dim DMA destinations fault the DMA engine)
        base = pl.multiple_of(ci * CHUNK, CHUNK)
        pltpu.make_async_copy(
            isect_ref.at[:, pl.ds(base, CHUNK)], ibuf.at[slot, m],
            isem.at[slot, m]).start()
        pltpu.make_async_copy(
            attrsT_ref.at[:, pl.ds(base, CHUNK)], abuf.at[slot, m],
            asem.at[slot, m]).start()

    # gang 0 loads straight from the PREFETCH scalars, before the list
    # copy even lands — its DMAs overlap the list transfer
    @pl.when(cnt > 0)
    def _():
        for m in range(GANG):
            member_dma(scal_ref[1 + m, i], 0, m)

    # copy this tile's 8-row list group (single rows violate the (8, 128)
    # sublane tiling when the compiler places `lists` in VMEM)
    grp = pl.multiple_of(8 * (i // 8), 8)
    pltpu.make_async_copy(lists_ref.at[pl.ds(grp, 8)], listbuf, lsem).start()
    pltpu.make_async_copy(lists_ref.at[pl.ds(grp, 8)], listbuf, lsem).wait()
    row = i % 8

    def gang_dma(p, slot):
        for m in range(GANG):
            jm = jnp.minimum(GANG * p + m, cnt - 1)   # duplicate last
            member_dma(listbuf[row, jm] & 0xFFFF, slot, m)

    # miss sentinel = the ray's scene-AABB exit distance (+margin), NOT
    # _BIG: every real hit satisfies t <= exit, and capping tbest lets the
    # front-to-back stop fire for tiles containing sky pixels (with _BIG
    # a single miss ray kept the whole tile marching the full list)
    init = tfar_ref[...] * 1.001 + 1e-2
    tb_ref[...] = init
    gb_ref[...] = jnp.zeros((TILE, NATTR + 3), jnp.float32)

    # Lists are FRONT-TO-BACK (select_chunks sorts by the conservative
    # near distance packed in bits 16+).  Once every ray's current best
    # is strictly closer than the next gang's near bound, no later chunk
    # can win (near is non-decreasing) — stop, skipping both the compute
    # and the DMA.  Invariant: gang p's DMAs were issued iff the loop
    # reaches p un-stopped.  A duplicated trailing chunk (odd counts) is
    # idempotent: identical t candidates, first-index argmin keeps the
    # first copy.
    def body(p, stop):
        @pl.when(jnp.logical_not(stop))
        def _():
            slot = jax.lax.rem(p, 2)
            for m in range(GANG):
                pltpu.make_async_copy(ibuf.at[slot, m], ibuf.at[slot, m],
                                      isem.at[slot, m]).wait()
                pltpu.make_async_copy(abuf.at[slot, m], abuf.at[slot, m],
                                      asem.at[slot, m]).wait()
            blk = jnp.concatenate(
                [ibuf[slot, m] for m in range(GANG)], axis=1)  # (16, gw)
            at = jnp.concatenate(
                [abuf[slot, m] for m in range(GANG)], axis=1)  # (NATTR, gw)
            kk = blk[9:10, :]

            def dot3(r0):
                # exact f32 — see the whole-table kernel's dot3
                return (d[:, 0:1] * blk[r0:r0 + 1, :]
                        + d[:, 1:2] * blk[r0 + 1:r0 + 2, :]
                        + d[:, 2:3] * blk[r0 + 2:r0 + 3, :])
            det = dot3(0)
            ud = dot3(3)
            vd = dot3(6)
            s = jnp.sign(det)
            ad = jnp.abs(det)
            sk = s * kk
            inv = 1.0 / jnp.maximum(ad, eps)
            sinv = s * inv
            valid = ((ad > eps) & (s * ud >= 0) & (s * vd >= 0)
                     & (s * (ud + vd) <= ad) & (sk > tmin_eps * ad))
            tval = kk * sinv
            tcand = jnp.where(valid & (tval > tmn), tval, _BIG)  # (TILE, gw)

            tmin_c = jnp.min(tcand, axis=1, keepdims=True)
            tbest = tb_ref[...]
            better = tmin_c < tbest
            improved = jnp.any(better)

            # winner extraction only when this gang beat something —
            # with front-to-back lists most gangs improve nothing, so
            # the one-hot/select/attr-fetch cost is skipped
            @pl.when(improved)
            def _():
                lanes = jax.lax.broadcasted_iota(
                    jnp.int32, tcand.shape, 1)
                idx_c = jnp.min(jnp.where(tcand == tmin_c, lanes, gw),
                                axis=1, keepdims=True)
                onehot = ((lanes == idx_c)
                          & (tmin_c < _BIG)).astype(jnp.float32)
                u_c = jnp.sum(onehot * (ud * sinv), axis=1, keepdims=True)
                v_c = jnp.sum(onehot * (vd * sinv), axis=1, keepdims=True)
                arow = jax.lax.dot_general(
                    onehot, at, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)  # (TILE, NATTR)
                gcand = jnp.concatenate(
                    [u_c, v_c, jnp.zeros_like(u_c), arow], axis=1)
                # strict < keeps the EARLIER list entry's winner on exact
                # t ties; within a gang the lane argmin is first-index —
                # equal-t resolution follows list order (near-sorted)
                tb_ref[...] = jnp.where(better, tmin_c, tbest)
                gb_ref[...] = jnp.where(better, gcand, gb_ref[...])

        # stop as soon as the NEXT gang's near bound beats every ray
        jn = jnp.minimum(GANG * (p + 1), nchunk - 1)
        near_next = jax.lax.shift_right_logical(
            listbuf[row, jn], 16).astype(jnp.float32)
        tmax = jnp.max(tb_ref[...])
        stop2 = stop | (near_next >= tmax)

        @pl.when((GANG * (p + 1) < cnt) & jnp.logical_not(stop2))
        def _():
            gang_dma(p + 1, jax.lax.rem(p + 1, 2))

        return stop2

    jax.lax.fori_loop(0, (cnt + GANG - 1) // GANG, body, False)
    out_ref[...] = _finish_gbuf(d, o_ref, tb_ref[...], gb_ref[...],
                                miss_at=init)


def _finish_gbuf(d, o_ref, tbest, g, miss_at=None):
    """Shared G-buffer interpolation tail (gbuffer._interp_gbuffer).
    miss_at: per-ray miss sentinel (the stream kernel's AABB-exit init);
    default _BIG (whole-table kernel)."""
    hit = tbest < (_BIG if miss_at is None else miss_at)
    ts = jnp.where(hit, tbest, 0.0)
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
    shin = g[:, 47:48]

    def interp3(a9):
        return w0 * a9[:, 0:3] + u * a9[:, 3:6] + v * a9[:, 6:9]

    normal = interp3(vn)
    nrm = jax.lax.rsqrt(jnp.maximum(
        jnp.sum(normal * normal, axis=1, keepdims=True), 1e-24))
    normal = normal * nrm
    tangent = interp3(vt)
    bitan = interp3(vb)
    uv = w0 * vuv[:, 0:2] + u * vuv[:, 2:4] + v * vuv[:, 4:6]
    o = o_ref[0:1, :]
    pos = o + ts * d
    n = d.shape[0]
    return jnp.concatenate([
        pos, normal, fn, tangent, bitan, uv, mat, ts,
        hit.astype(jnp.float32), alb, spec, shin,
        jnp.zeros((n, NOUT - 28), jnp.float32),
    ], axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def raycast_stream(dirs: Array, origin: Array, isect: Array, attrsT: Array,
                   lists: Array, counts: Array, spheres: Array,
                   interpret: bool = False,
                   tmin: Optional[Array] = None) -> Array:
    """Streamed closest-hit G-buffer: (N, 3) same-origin rays ->
    (N, NOUT), N a TILE multiple; tables + spheres from
    pack_tables_stream, chunk lists from select_chunks.  Output columns
    as raycast_gbuf24.

    tmin: optional (N, 1) per-ray minimum hit distance — the alpha-mask
    see-through re-cast (fs:169-172 `discard`) continues rays past a
    masked hit (render/fast.py alpha_resolve)."""
    n = dirs.shape[0]
    assert n % TILE == 0, n
    tp = isect.shape[1]
    assert tp % CHUNK == 0, tp
    nchunk = tp // CHUNK
    ncp = lists.shape[1]
    # the kernel copies 8-row list groups, so the row count must cover
    # the last tile's group (select_chunks pads; ADVICE r3)
    nrt8 = -(-(n // TILE) // 8) * 8
    assert lists.shape[0] >= nrt8 and ncp % 128 == 0 \
        and ncp >= nchunk, (lists.shape, n, nchunk)
    kern = functools.partial(_stream_kernel, nchunk=ncp, eps=1e-7,
                             tmin_eps=1e-4)
    # prefetch scalars: [count | gang-0 chunk ids] per tile, so the first
    # gang's DMAs issue before the list copy lands
    nrt = n // TILE
    gidx = jnp.minimum(jnp.arange(GANG)[None, :],
                       jnp.maximum(counts[:, None] - 1, 0))
    gang0 = jnp.take_along_axis(lists[:nrt], gidx, axis=1) & 0xFFFF
    scal = jnp.concatenate([counts[:, None], gang0], axis=1)   # (nrt, 1+G)

    # per-ray scene-AABB (origin-relative, from the chunk spheres) exit
    # distance — the miss sentinel that keeps sky rays from pinning the
    # early-out (see _stream_kernel)
    real = spheres[:, 3] >= 0.0
    c3, r3 = spheres[:, :3], spheres[:, 3:4]
    big = jnp.float32(_BIG)
    vmin = jnp.min(jnp.where(real[:, None], c3 - r3, big), axis=0)
    vmax = jnp.max(jnp.where(real[:, None], c3 + r3, -big), axis=0)
    dinv = 1.0 / jnp.where(jnp.abs(dirs) < 1e-12,
                           jnp.float32(1e-12), dirs)
    ta = vmin[None, :] * dinv
    tb = vmax[None, :] * dinv
    tfar = jnp.maximum(jnp.min(jnp.maximum(ta, tb), axis=1), 0.0)[:, None]
    if tmin is None:
        tmin = jnp.full((n, 1), -1.0, jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, 3), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),     # lists (nrt, nchunk)
            pl.BlockSpec(memory_space=pl.ANY),     # isect (16, Tp)
            pl.BlockSpec(memory_space=pl.ANY),     # attrsT (NATTR, Tp)
        ],
        out_specs=pl.BlockSpec((TILE, NOUT), lambda i, s: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((8, ncp), jnp.int32),
            pltpu.VMEM((TILE, 1), jnp.float32),
            pltpu.VMEM((TILE, NATTR + 3), jnp.float32),
            pltpu.VMEM((2, GANG, 16, CHUNK), jnp.float32),
            pltpu.VMEM((2, GANG, NATTR, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2, GANG)),
            pltpu.SemaphoreType.DMA((2, GANG)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, NOUT), jnp.float32),
        interpret=interpret,
    )(scal.T, dirs, origin[None, :], tfar, tmin, lists, isect, attrsT)


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
