"""Multi-host (DCN) path: 2 real processes x 4 virtual CPU devices take one
data-parallel step over the global 8-device mesh (the jax multiprocess
test pattern); losses must agree across processes and with a
single-device oracle over the same global batch."""
import os
import socket
import subprocess
import sys

import numpy as np


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(timeout=560):
    import time

    worker = os.path.join(os.path.dirname(__file__), "_dcn_worker.py")
    coordinator = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items() if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}

    def spawn(pid):
        return subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )

    # process 0 hosts the coordination service: give it a head start so
    # process 1's first connect doesn't race the service bind on a loaded
    # host (initialize retries connects, but each failed round costs
    # seconds of the 1-core budget)
    procs = [spawn(0)]
    time.sleep(2.0)
    procs.append(spawn(1))
    outputs = []
    failure = None
    for p in procs:
        if failure:
            # a peer already failed; the survivor would block at a barrier
            # until its own timeout — reap it now
            p.kill()
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
            failure = failure or f"worker timed out after {timeout}s:\n{err[-3000:]}"
            continue
        if p.returncode != 0:
            failure = failure or f"worker failed:\n{err[-3000:]}"
        outputs.append(out)
    if failure:
        raise RuntimeError(failure)
    return outputs


def test_two_process_train_step():
    # process coordination over localhost can time out when the 1-core
    # host is saturated by parallel compiles; retry with a cooldown —
    # but only on the coordination-timeout signature, so genuine
    # distributed bugs fail on the first attempt
    import time

    _TRANSIENT = ("DEADLINE_EXCEEDED", "Deadline Exceeded", "timed out",
                  "Coordination service", "UNAVAILABLE", "failed to connect")
    # 2 attempts x <=560 s + one 15 s cooldown bounds the worst case near
    # 19 min (the old 3 x 560 + sleeps could burn ~29); with the in-worker
    # compile-then-barrier rendezvous the first attempt should hold even
    # under load, so the retry is a safety net, not the mechanism
    for attempt in range(2):
        try:
            outputs = _run_workers()
            break
        except RuntimeError as e:
            if attempt == 1 or not any(s in str(e) for s in _TRANSIENT):
                raise
            print(f"retry after transient coordination failure: "
                  f"{str(e)[-300:]}", file=sys.stderr)
            time.sleep(15)

    losses = {}
    for out in outputs:
        for line in out.splitlines():
            if line.startswith("DCN_LOSS"):
                _, pid, loss = line.split()
                losses[int(pid)] = float(loss)
    assert sorted(losses) == [0, 1], f"missing loss lines: {outputs}"
    assert np.isfinite(losses[0])
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)

    trainer_losses = {}
    for out in outputs:
        for line in out.splitlines():
            if line.startswith("DCN_TRAINER_LOSS"):
                _, pid, loss = line.split()
                trainer_losses[int(pid)] = float(loss)
    assert sorted(trainer_losses) == [0, 1], f"missing trainer lines: {outputs}"
    assert np.isfinite(trainer_losses[0])
    np.testing.assert_allclose(trainer_losses[0], trainer_losses[1], rtol=1e-6)

    # single-device oracle over the same (full) global batch
    import jax
    import jax.numpy as jnp
    import optax

    from page_segmentation_tpu.models.fcn import FCNSkip
    from page_segmentation_tpu.train.metrics import Loss
    from page_segmentation_tpu.train.steps import make_step_fns

    module = FCNSkip(n_classes=2)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))["params"]
    optimizer = optax.sgd(1e-2)
    opt_state = optimizer.init(params)
    train_step, _ = make_step_fns(module, optimizer, Loss.CATEGORICAL_CROSSENTROPY())

    rng = np.random.RandomState(0)
    h = w = 32
    batch = {
        "image": rng.rand(8, h, w, 1).astype(np.float32),
        "mask": rng.randint(0, 2, (8, h, w)).astype(np.int32),
        "binary": np.ones((8, h, w), np.uint8),
        "weights": np.ones((8, h, w), np.float32),
    }
    _, _, _, metrics = train_step(params, {}, opt_state, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(losses[0], float(metrics["loss"]), rtol=1e-5)
