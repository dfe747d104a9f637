"""Mosaic probes for the x-major sub-sliced sims dot design.

Bisects the layout-legality questions on REAL hardware (interpret mode
cannot see Mosaic constraints):

  A. DMA an (BWG, BH, 128) bf16 box from an x-group-major HBM source at
     STATIC offsets; read it back whole. (baseline legality)
  B. + collapse reshape (BWG, BH, 128) -> (BWG*BH, 128), BH % 16 == 0.
  C. + dim-0 REF dynamic slice by whole x-groups before the reshape.
  D. + UNALIGNED DMA source offsets on both sliced dims.

Usage: /opt/venv/bin/python tools/probe_dma_align.py
"""
import sys
import traceback

import numpy as np

sys.path.insert(0, ".")

BH, BWG = 16, 12  # bh tiled 16-multiple; bwg intentionally NOT
HF, WG = 64, 40


def run(variant, y0v, xg0v, sub0v):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nsub = 4

    def kern(off_ref, src_ref, out_ref, band, sem):
        if variant == "D":
            y0, xg0 = off_ref[0], off_ref[1]
        elif variant == "D2":
            # production-style hints: the tiled-dim offset promises
            # 8-alignment; the untiled dim-0 offset stays arbitrary
            y0 = pl.multiple_of(off_ref[0], 8)
            xg0 = off_ref[1]
        else:
            y0, xg0 = 0, 0
        cp = pltpu.make_async_copy(
            src_ref.at[pl.ds(xg0, BWG), pl.ds(y0, BH)], band, sem
        )
        cp.start()
        cp.wait()
        if variant == "A":
            out_ref[...] = band[0 : nsub].reshape(
                nsub, BH, 128
            )[:, :, :].astype(jnp.float32).reshape(nsub * BH, 128)
            return
        if variant == "B":
            flat = band[...].reshape(BWG * BH, 128)
            out_ref[...] = flat[0 : nsub * BH].astype(jnp.float32)
            return
        sub0 = off_ref[2]
        rows3 = band[pl.ds(sub0, nsub)]  # (nsub, BH, 128)
        out_ref[...] = rows3.reshape(nsub * BH, 128).astype(jnp.float32)

    rng = np.random.RandomState(0)
    src = jnp.asarray(
        rng.randn(WG, HF, 128).astype(np.float32), jnp.bfloat16
    )
    offs = jnp.asarray([y0v, xg0v, sub0v], jnp.int32)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((BWG, BH, 128), jnp.bfloat16),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((4 * BH, 128), jnp.float32),
    )(offs, src)
    out = np.asarray(out)
    y0, xg0 = (y0v, xg0v) if variant in ("D", "D2") else (0, 0)
    ref = np.asarray(
        src[xg0 : xg0 + BWG, y0 : y0 + BH].astype(jnp.float32)
    ).reshape(BWG * BH, 128)[sub0v * BH : (sub0v + 4) * BH]
    if variant in ("A", "B"):
        ref = np.asarray(
            src[xg0 : xg0 + BWG, y0 : y0 + BH].astype(jnp.float32)
        ).reshape(BWG * BH, 128)[: 4 * BH]
    return np.array_equal(out, ref)


def probe_f32_dot_truncation():
    """Is an in-kernel f32 dot_general exact, or bf16-truncated?

    v5e result (2026-08-19): TRUNCATED — a diagonal one-hot pick of
    values needing >8 mantissa bits returns exactly their bf16
    roundings. Consequence recorded in bp_beam.py's header: the beam
    grid-gather/scatter dots carry bf16 value rounding by design.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kern(x_ref, e_ref, out_ref):
        out_ref[...] = jax.lax.dot_general(
            x_ref[...], e_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    n = 128
    vals = (
        1.0 + np.arange(n, dtype=np.float64) * 2.0 ** -18
    ).astype(np.float32)
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32)
    )(jnp.asarray(np.diag(vals)), jnp.eye(n, dtype=jnp.float32))
    got = np.diag(np.asarray(out))
    if np.array_equal(got, vals):
        print("f32 dot_general: EXACT (full f32 operands)")
    else:
        tr = np.asarray(
            jnp.asarray(vals, jnp.bfloat16).astype(jnp.float32)
        )
        print(
            "f32 dot_general: TRUNCATED (matches bf16 rounding: %s)"
            % np.array_equal(got, tr)
        )


def main():
    probe_f32_dot_truncation()
    cases = [
        ("A", 0, 0, 0),
        ("B", 0, 0, 0),
        ("C", 0, 0, 0),
        ("C", 0, 0, 2),
        ("C", 0, 0, 8),
        ("D", 3, 5, 2),
        ("D", 9, 1, 7),
    ]
    for variant, y0, xg0, sub0 in cases:
        try:
            ok = run(variant, y0, xg0, sub0)
            print("%s y0=%d xg0=%d sub0=%d -> %s" % (
                variant, y0, xg0, sub0,
                "EXACT" if ok else "WRONG VALUES"))
        except Exception:  # noqa: BLE001 — report the Mosaic error
            tb = traceback.format_exc().splitlines()
            msg = [ln for ln in tb if ln.strip()][-3:]
            print("%s y0=%d xg0=%d sub0=%d -> FAILED:\n    %s" % (
                variant, y0, xg0, sub0, "\n    ".join(msg)))


if __name__ == "__main__":
    main()
