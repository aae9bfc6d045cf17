"""K5 — fused GN-apply + Mish + conv3x3 stage kernel (r3 megakernel probe).

Motivation (BASELINE.md r3): the identity ablation charges GN+Mish 6.56 ms
of the 20.9 ms VAE step, and every graph-level attack (standalone kernel,
barrier, custom VJP) lost because XLA's conv fusions are already
traffic-optimal — the cost is VPU work serialized against the MXU inside
those fusions. This kernel attacks the serialization itself: it computes
``conv3x3(mish(GroupNorm_apply(y)))`` in one Pallas program per image with
a one-band LAG between the VPU phase (normalize+mish+shifted copies) and
the MXU phase (9 taps as contiguous [TH*W, Cin] @ [Cin, Cout] matmuls), so
Mosaic can overlap band t's elementwise work with band t-1's matmuls.

GroupNorm statistics stay OUTSIDE (they need all of H*W): the caller folds
them into per-(batch, channel) affine arrays alpha/beta exactly like
ops/layers.group_norm's moments form, so this kernel covers the
normalize+activation+conv chain — the part the trace shows fused into XLA's
convolution fusions (reference chain: lunar_generate.py:35-44 ResBlock
conv->GN->Mish->conv).

Layout: activations NHWC bf16, Cin on lanes. The normalized band is stored
into three width-shifted scratch copies (g_left/g_center/g_right, each
[(H+2), W, Cin]); a (dy, dx) tap's input window is then the CONTIGUOUS row
range [r0+dy : r0+dy+TH] of copy dx — no strided-view relayout at matmul
time, and the 3x3 conv becomes 9 clean MXU contractions per band.

Numerics match the model path bit-for-bit at bf16: normalize rounds to the
activation dtype before mish's f32 internals (group_norm -> astype ->
mish), and the conv accumulates in f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def supported_shape(h: int, w: int, cin: int, cout: int,
                    band: int = 32) -> bool:
    """Whole-image-in-VMEM banding: needs aligned dims and a modest
    working set (3 shifted copies + accumulator)."""
    if h % band != 0 or w % 8 != 0:
        return False
    if cin % 128 != 0 and cin not in (32, 64):
        return False
    # 3 copies [(H+2+pad) * W * Cin] bf16 + acc [band * W * Cout] f32
    copies = 3 * (h + 8) * w * cin * 2
    acc = band * w * cout * 4
    return copies + acc < 10 * 1024 * 1024


def _kernel(x_ref, a_ref, b_ref, w_ref, wb_ref, o_ref,
            gl_ref, gc_ref, gr_ref, *,
            band: int, h: int, wdt: int, nbands: int, variant: str):
    i = pl.program_id(1)

    # ---- VPU phase: normalize+mish band i, store 3 width-shifted copies
    @pl.when(i < nbands)
    def _vpu():
        x = x_ref[0].astype(jnp.float32)              # [band, W, Cin]
        a = a_ref[0][None]                            # [1, 1, Cin] -> bcast
        bb = b_ref[0][None]
        g = (x * a + bb).astype(o_ref.dtype)          # round like group_norm
        g32 = g.astype(jnp.float32)
        g = (g32 * jnp.tanh(jax.nn.softplus(g32))).astype(o_ref.dtype)
        zcol = jnp.zeros((band, 1, g.shape[-1]), g.dtype)
        r0 = 1 + i * band
        gc_ref[pl.dslice(r0, band)] = g
        gl_ref[pl.dslice(r0, band)] = jnp.concatenate(
            [zcol, g[:, : wdt - 1, :]], axis=1)
        gr_ref[pl.dslice(r0, band)] = jnp.concatenate(
            [g[:, 1:, :], zcol], axis=1)

    # zero halo rows once per image (top row 0, bottom row h+1)
    @pl.when(i == 0)
    def _zero():
        for ref in (gl_ref, gc_ref, gr_ref):
            z = jnp.zeros((1, wdt, ref.shape[-1]), ref.dtype)
            ref[pl.dslice(0, 1)] = z
            ref[pl.dslice(h + 1, 1)] = z

    # ---- MXU phase: 9-tap conv for band i-1 (its +1 halo row is the
    # first row of band i, already written above)
    @pl.when(i > 0)
    def _mxu():
        t = i - 1
        r0 = t * band
        if variant == "im2col":
            # one 9*Cin-deep contraction per band: VPU concat builds the
            # patch matrix, the MXU sees a single deep matmul
            taps = []
            for dy in range(3):
                for ref in (gl_ref, gc_ref, gr_ref):
                    taps.append(ref[pl.dslice(r0 + dy, band)])
            lhs = jnp.concatenate(taps, axis=-1)      # [band, W, 9*Cin]
            lhs = lhs.reshape(band * wdt, lhs.shape[-1])
            acc = lax.dot_general(
                lhs, w_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            acc = jnp.zeros((band * wdt, w_ref.shape[-1]), jnp.float32)
            for dy in range(3):
                for dx, ref in enumerate((gl_ref, gc_ref, gr_ref)):
                    blk = ref[pl.dslice(r0 + dy, band)]   # [band, W, Cin]
                    blk = blk.reshape(band * wdt, blk.shape[-1])
                    acc += lax.dot_general(
                        blk, w_ref[dy * 3 + dx],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
        acc = acc + wb_ref[0][None].astype(jnp.float32)
        o_ref[0] = acc.reshape(band, wdt, -1).astype(o_ref.dtype)


def gn_mish_conv3_pallas(y: jax.Array, alpha: jax.Array, beta: jax.Array,
                         w: jax.Array, wb: jax.Array, *,
                         band: int = 16, variant: str = "dots9"
                         ) -> jax.Array:
    """conv3x3_same(mish(y * alpha + beta)) + wb.

    y: [B, H, W, Cin] activations (bf16/f32); alpha/beta: [B, Cin] f32
    per-batch GN affine (inv_std*gamma and beta - mean*inv_std*gamma);
    w: [3, 3, Cin, Cout]; wb: [Cout].
    """
    b, h, wdt, cin = y.shape
    cout = w.shape[-1]
    assert supported_shape(h, wdt, cin, cout, band), (h, wdt, cin, cout)
    nbands = h // band
    grid = (b, nbands + 1)
    interp = jax.default_backend() != "tpu"
    if variant == "im2col":
        # tap order matches the kernel's concat: (dy, dx=l,c,r) major
        wr = w.astype(y.dtype).reshape(9, cin, cout).reshape(
            9 * cin, cout)[None]
        wspec = pl.BlockSpec((1, 9 * cin, cout), lambda i, t: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    else:
        wr = w.astype(y.dtype).reshape(9, cin, cout)
        wspec = pl.BlockSpec((9, cin, cout), lambda i, t: (0, 0, 0),
                             memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, band=band, h=h, wdt=wdt, nbands=nbands,
                          variant=variant),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, band, wdt, cin),
                         lambda i, t: (i, jnp.minimum(t, nbands - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cin), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cin), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            wspec,
            pl.BlockSpec((1, cout), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, band, wdt, cout),
            lambda i, t: (i, jnp.maximum(t - 1, 0), 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, wdt, cout), y.dtype),
        scratch_shapes=[
            pltpu.VMEM((h + 2, wdt, cin), y.dtype),   # g left-shifted
            pltpu.VMEM((h + 2, wdt, cin), y.dtype),   # g center
            pltpu.VMEM((h + 2, wdt, cin), y.dtype),   # g right-shifted
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # default scoped limit is 16 MB; the 3 shifted copies alone are
            # 6.4 MB at the 128px stage, so lift it (v5e VMEM is far larger)
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interp,
    )(y.reshape(b, h, wdt, cin), alpha[:, None, :].astype(jnp.float32),
      beta[:, None, :].astype(jnp.float32), wr,
      wb.astype(y.dtype)[None, :])
    return out


def gn_mish_conv3_reference(y, alpha, beta, w, wb):
    """XLA composition with identical rounding, for parity tests."""
    g = (y.astype(jnp.float32) * alpha[:, None, None, :]
         + beta[:, None, None, :]).astype(y.dtype)
    g32 = g.astype(jnp.float32)
    g = (g32 * jnp.tanh(jax.nn.softplus(g32))).astype(y.dtype)
    out = lax.conv_general_dilated(
        g, w.astype(y.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (out + wb.astype(jnp.float32)).astype(y.dtype)
