"""Minimal repro: tunneled-TPU runtime empties the download of a
Pallas-bearing program under concurrent device interaction.

Observed on this machine's `axon` tunnel (TPU v5 lite) in round 3 and
worked around in inference/pipeline.py: when any other device interaction
— a `device_put` from a prefetch thread, or the next dispatch — overlaps
the host download (`np.asarray`) of an executable that contains a Pallas
call, the download returns a ZERO-LENGTH buffer instead of raising.  The
same program with the Pallas call replaced by plain XLA ops downloads
correctly under identical overlap.

Run on the real TPU (no arguments):

    python tools/repro_pallas_download.py

Prints one line per trial; a FAIL line is the bug reproducing.  Exit code
1 if any Pallas-program download came back corrupt while the XLA-only
control stayed clean.

This is a driver bug report artifact, not part of the library: the
shipped pipelines avoid the condition entirely (the fused cc-vote uses
the pure-XLA labeler, ops/pallas_cc.cc_vote_batch_xla; the Pallas path
serializes its downloads).
"""
import functools
import sys
import threading
import time

import numpy as np


def main(trials: int = 20, simple: bool = False) -> int:
    import jax
    import jax.numpy as jnp

    shape = (424, 304)  # a normalized page

    if simple:
        # a trivial elementwise Pallas kernel: did NOT reproduce the bug
        # in 2026-08-17 testing — the trigger needs the real workload below
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def kernel(x_ref, o_ref):
            o_ref[:] = x_ref[:] + 1

        @jax.jit
        def with_pallas(x):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x.astype(jnp.int32)).astype(jnp.int32)

        def expected(x):
            return x.astype(np.int32) + 1

    else:
        # the real workload the pipeline dispatches: the VMEM-resident CC
        # vote kernel (while_loop inside the Pallas body) on page-sized ink
        from page_segmentation_tpu.ops.pallas_cc import cc_vote_batch

        @jax.jit
        def with_pallas(x):
            ink = x != 0
            pred = (x % 3).astype(jnp.int32)
            return cc_vote_batch(pred[None], ink[None], n_classes=3)[0]

        def expected(x):
            from page_segmentation_tpu.data.dataset import SingleData
            from page_segmentation_tpu.inference.postprocess import (
                vote_connected_component_class,
            )

            return vote_connected_component_class(
                (x % 3).astype(np.int32),
                SingleData(binary=(x != 0).astype(np.uint8)),
            )

    from page_segmentation_tpu.ops.pallas_cc import cc_vote_batch_xla

    @jax.jit
    def without_pallas(x):
        ink = x != 0
        pred = (x % 3).astype(jnp.int32)
        return cc_vote_batch_xla(pred[None], ink[None], n_classes=3)[0]

    def trial(fn, check, seed):
        """Dispatch fn, then download its result while a second thread
        hammers device_put (the prefetch-overlap pattern)."""
        rng = np.random.RandomState(seed)
        x = (rng.rand(*shape) > 0.6).astype(np.uint8) * rng.randint(
            1, 255, shape
        ).astype(np.uint8)
        out = fn(jax.device_put(x))
        stop = threading.Event()

        def interfere():
            while not stop.is_set():
                jax.device_put(rng.randint(0, 255, (64, 1024)).astype(np.uint8))

        t = threading.Thread(target=interfere)
        t.start()
        time.sleep(0.005)
        host = np.asarray(out)
        stop.set()
        t.join()
        if host.size != x.size:
            return f"corrupt download: size {host.size} != {x.size}"
        if not np.array_equal(host, check(x)):
            return "corrupt download: wrong contents"
        return None

    if not simple:
        def expected_cached(x):  # host union-find vote as the oracle
            return expected(x)
    else:
        expected_cached = expected

    failures = {"pallas": 0, "xla": 0}
    for i in range(trials):
        for name, fn in (("pallas", with_pallas), ("xla", without_pallas)):
            err = trial(fn, expected_cached, seed=i)
            status = f"FAIL ({err})" if err else "ok"
            print(f"trial {i:2d} {name:6s}: {status}", flush=True)
            if err:
                failures[name] += 1
    print(f"\nfailures: pallas={failures['pallas']}/{trials} "
          f"xla={failures['xla']}/{trials} on {jax.devices()[0]}")
    return 1 if failures["pallas"] and not failures["xla"] else 0


if __name__ == "__main__":
    sys.exit(main())
