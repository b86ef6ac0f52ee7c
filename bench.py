"""Headline benchmark: 300-DPI page predict throughput on one TPU chip.

Measures the pipelined fused predict (inference/pipeline.py): raw
full-resolution uint8 pages -> host box-decimation -> device cubic
resample + invert/normalize + FCN-skip forward (bf16) + argmax + palette
gather -> host overlay/inverted reconstruction.  Output contract per page:
the color/overlay/inverted uint8 RGB trio at the normalized scale — the
reference's predict stack (SURVEY §3.2) end to end.

Prints ONE JSON line:
    {"metric": "predict_pages_per_sec_per_chip", "value": N,
     "unit": "pages/sec", "vs_baseline": N/50}

Baseline 50 pages/sec/chip is the BASELINE.md north-star target (the
reference publishes no numbers).

Reliability (VERDICT r3 #1): the process forks on startup — the parent
is a watchdog that, on --hard-timeout (default 1100 s, below any
plausible driver budget) or on receiving the driver's SIGTERM, prints
ONE JSON line from the measuring child's last on-disk checkpoint and
exits 0.  Before any TPU warmup, a killable subprocess probes the
tunnel (tools/link_health.py) and sleep-retries through wedge phases in
bounded steps, then trims rep/pass budgets to the time that remains.
"""
import argparse
import json
import os
import signal
import sys
import time

import numpy as np


_SYNTH_BUFS = {}  # (n, h, w) -> (pages, binaries); GB-scale cold-fault cost paid once

# live progress shared with the watchdog: the tunneled link can wedge
# *inside* a blocking transfer, where no loop-level time budget can fire
_partial = {"rates": [], "stage": "startup"}

# set by _supervise() in the measuring child: path of the JSON state file
# the watchdog parent reads when it must report for a wedged child
_STATE_PATH = None


def _checkpoint():
    """Persist ``_partial`` for the watchdog parent (atomic replace).

    The round-3 failure mode was a ``threading.Timer`` watchdog starved by
    a GIL-holding wedged C call (VERDICT r3 weak #1): the watchdog now
    lives in a separate *process* and can only see what this child wrote
    to disk, so every measured rep / completed section checkpoints here."""
    if _STATE_PATH is None:
        return
    try:
        tmp = _STATE_PATH + ".tmp"
        with open(tmp, "w") as f:
            json.dump(_partial, f)
        os.replace(tmp, _STATE_PATH)
    except OSError:
        pass  # reporting must never kill a measurement


def _partial_result(partial: dict, note: str) -> dict:
    """The single JSON line the watchdog emits for a wedged/killed child,
    built from the checkpointed state: headline value from the reps that
    completed, plus every section that finished before the wedge."""
    rates = list(partial.get("rates") or [])
    value = float(np.median(rates)) if rates else 0.0
    result = {
        "metric": "predict_pages_per_sec_per_chip",
        "value": round(value, 2),
        "unit": "pages/sec",
        "vs_baseline": round(value / 50.0, 3),
        "reps": [round(r, 1) for r in rates],
        "watchdog": f"{note} at stage '{partial.get('stage')}' (degraded or "
                    "wedged tunnel link; see docs/PERFORMANCE.md) — result "
                    "from the reps/sections that completed",
    }
    if "corpus_pages_done" in partial:
        result["corpus_pages_done"] = partial["corpus_pages_done"]
    sections = partial.get("sections")
    if sections:
        # the headline dict (value, median policy, train/sustained
        # sections...) as of the last checkpoint: it carries the real
        # measured number, so it wins over the bare-rates reconstruction
        for key, val in sections.items():
            result[key] = val
        result["watchdog"] = (
            f"{note} at stage '{partial.get('stage')}' AFTER the headline "
            "was measured — value is the full headline median; later "
            "sections may be missing"
        )
    return result


def _read_state(state_path: str) -> dict:
    try:
        with open(state_path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _supervise(seconds: float):
    """Fork into measuring child + watchdog parent.

    Returns (in the child) after arming checkpointing; the parent never
    returns: it polls the child and, when the child exceeds ``seconds``
    wall-clock OR the parent itself receives SIGTERM/SIGINT (the driver's
    own budget expiring), prints ONE JSON line from the child's last
    checkpoint and exits 0.  A separate process is immune to the two ways
    the round-3 in-process watchdog died: a GIL-holding wedged C call
    starving the timer thread, and a driver SIGKILL arriving before the
    2200 s default ever fired (BENCH_r03.json rc 124)."""
    global _STATE_PATH
    if seconds <= 0 or not hasattr(os, "fork"):
        return
    state_path = f"/tmp/ps_bench_state_{os.getpid()}.json"
    try:
        pid = os.fork()
    except OSError:
        return  # no supervision; the bench still runs
    if pid == 0:  # measuring child
        _STATE_PATH = state_path
        _checkpoint()
        return

    # ------------------------------------------------------ watchdog parent
    def emit_and_kill(note: str, exit_code: int = 0):
        state = _read_state(state_path)
        if state.get("emitted"):
            # the child checkpoints emitted=True immediately BEFORE its
            # final print: give it a grace window to finish flushing —
            # killing it mid-print would lose the round's only JSON line
            for _ in range(15):
                try:
                    done_pid, _status = os.waitpid(pid, os.WNOHANG)
                except OSError:
                    os._exit(0)
                if done_pid:
                    os._exit(0)
                time.sleep(1.0)
        else:
            print(json.dumps(_partial_result(state, note)), flush=True)
        try:
            os.kill(pid, signal.SIGKILL)
            os.waitpid(pid, 0)
        except OSError:
            pass
        os._exit(exit_code)

    def on_signal(signum, _frame):
        # the driver's budget expired before ours: report what the child
        # measured so the round still records a real number
        emit_and_kill(f"driver signal {signal.Signals(signum).name} "
                      f"after {time.monotonic() - t0:.0f}s")

    signal.signal(signal.SIGTERM, on_signal)
    signal.signal(signal.SIGINT, on_signal)
    t0 = time.monotonic()
    while True:
        try:
            done_pid, status = os.waitpid(pid, os.WNOHANG)
        except OSError:
            os._exit(0)
        if done_pid:
            code = os.waitstatus_to_exitcode(status)
            if code == 0:
                os._exit(0)  # child printed its own line
            # child crashed: if the headline was already measured, the
            # number is valid regardless of the later crash — report it
            # (with the crash noted) instead of losing the round's record
            # emitted=True is set BEFORE the final print and printed=True
            # immediately AFTER it: a nonzero exit with printed unset means
            # the line cannot be complete — recover the measured sections
            # (advisor r4); with printed set, the complete line is already
            # out (teardown crash) and a second partial line would be the
            # stale one a last-line consumer then wrongly records
            state = _read_state(state_path)
            if state.get("printed"):
                os._exit(0)
            if state.get("sections"):
                print(json.dumps(_partial_result(
                    state, f"bench child exited rc={code}")), flush=True)
                os._exit(0)
            os._exit(code if code > 0 else 1)
        if time.monotonic() - t0 > seconds:
            emit_and_kill(f"bench exceeded {seconds:.0f}s wall-clock")
        time.sleep(1.0)


def preflight_link_probe(budget: float, probe_timeout: float = 75.0,
                         sleep_s: float = 45.0,
                         healthy_budget: float = 0.0,
                         degraded_sleep_s: float = 25.0) -> dict:
    """Probe the TPU tunnel in a killable subprocess before any warmup.

    Two gates, both bounded:

    * **responsive** (the r3 lesson, VERDICT r3 weak #5): a wedged probe
      subprocess is killed at ``probe_timeout``; the bench sleeps in
      bounded steps and re-probes until the link answers or ``budget``
      is spent, so a run that starts mid-wedge sleeps through it and
      still measures with whatever time remains.
    * **non-degraded** (the r4 lesson, VERDICT r4 weak #5): a responsive
      probe whose link reads unhealthy (link_health.py: <20 MB/s either
      direction or >150 ms dispatch) no longer starts the measurement
      immediately — the official number was being captured hostage to
      the tunnel's worst phases (BENCH_r04 median 166.8 on an 8.8 MB/s
      phase vs 219-235 on quiet ones).  Within ``healthy_budget``
      seconds the bench re-probes for a non-degraded window; on expiry
      it measures anyway and records the phase, so the capture policy is
      auditable either way (``probe_history`` keeps every reading).
    """
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    probe_cmd = [sys.executable, os.path.join(here, "tools", "link_health.py"),
                 "--mb", "2", "--reps", "1"]
    info = {"probes": 0, "waited_s": 0.0, "ok": False,
            "healthy_budget_s": round(healthy_budget, 1),
            "probe_history": []}
    t0 = time.monotonic()
    while True:
        info["probes"] += 1
        _partial["stage"] = f"preflight probe #{info['probes']}"
        _checkpoint()
        try:
            proc = subprocess.run(probe_cmd, capture_output=True, text=True,
                                  timeout=probe_timeout)
            ok = proc.returncode == 0
        except subprocess.TimeoutExpired:
            ok = False
        waited = time.monotonic() - t0
        if ok:
            # parse THIS probe's reading; rc 0 with no parsable link line
            # (truncated/garbled stdout) counts as a failed probe — the
            # gate must never decide (or record accepted_degraded) against
            # a PREVIOUS probe's stale numbers
            link = None
            for line in reversed(proc.stdout.strip().splitlines()):
                try:
                    parsed = json.loads(line)
                except ValueError:
                    continue
                link = {k: parsed[k] for k in
                        ("upload_mb_s", "download_mb_s",
                         "dispatch_ms", "healthy") if k in parsed}
                break
            ok = link is not None
        if ok:
            info["ok"] = True
            info["link"] = link
            info["probe_history"].append(link)
            if info.get("link", {}).get("healthy", True):
                break
            if waited >= healthy_budget:
                info["accepted_degraded"] = True
                print("preflight: accepting a degraded phase "
                      f"({info['link']}) — healthy-window budget "
                      f"{healthy_budget:.0f}s spent", file=sys.stderr)
                break
            print(f"preflight: link responsive but degraded "
                  f"({info['link']}); waiting {degraded_sleep_s:.0f}s for a "
                  f"healthy window ({waited:.0f}/{healthy_budget:.0f}s)",
                  file=sys.stderr)
            time.sleep(min(degraded_sleep_s, healthy_budget - waited))
            continue
        if waited >= budget:
            break
        print(f"preflight: link probe #{info['probes']} failed/wedged; "
              f"sleeping {sleep_s:.0f}s ({waited:.0f}/{budget:.0f}s probe "
              "budget spent)", file=sys.stderr)
        time.sleep(min(sleep_s, budget - waited))
    info["waited_s"] = round(time.monotonic() - t0, 1)
    if (info.get("ok") and not info.get("link", {}).get("healthy", True)
            and "accepted_degraded" not in info):
        # the wedge budget ran out while waiting for a healthy window
        # after an earlier degraded-but-responsive probe: the measurement
        # proceeds against that phase — record it as accepted
        info["accepted_degraded"] = True
    return info


def _synth_range(pages, binaries, rng, h, w, line_height, start, stop):
    """Per-page synthesis (page-local writes — cache-friendly on the
    1-core host; a cross-page vectorized variant measured 10x slower from
    strided scatter writes).  The binary is written directly alongside the
    page (every ink write mirrors a 0-write; everything else is paper) —
    a thresholding pass would re-read the whole page and allocate a
    page-sized temp, which doubles memory traffic during the host's
    starvation phases."""
    row_starts = np.arange(h // 8, h - h // 8 - line_height, int(line_height * 1.6))
    col_starts = np.arange(w // 10, w - w // 10 - 25, 35)
    for i in range(start, stop):
        page = pages[i]
        binary = binaries[i]
        page[...] = 235  # paper (>=128 -> binary 255)
        binary[...] = 255
        present = rng.rand(len(row_starts), len(col_starts)) < 0.85
        shades = rng.randint(10, 60, size=present.shape).astype(np.uint8)
        for ri, row in enumerate(row_starts):
            cols = col_starts[present[ri]]
            if len(cols):
                block = page[row : row + line_height]
                bin_block = binary[row : row + line_height]
                for c, shade in zip(cols, shades[ri][present[ri]]):
                    block[:, c : c + 25] = shade  # ink shades 10-60 (<128)
                    bin_block[:, c : c + 25] = 0
        if i % 3 == 0:
            page[int(h * 0.7) : int(h * 0.85), int(w * 0.2) : int(w * 0.8)] = 120
            binary[int(h * 0.7) : int(h * 0.85), int(w * 0.2) : int(w * 0.8)] = 0


def synthesize_pages(n, h, w, seed=0):
    """Synthetic 300-DPI historical pages: text lines + a figure block.
    Every page is distinct (per-page glyph presence + shades)."""
    line_height = 50  # px at 300 DPI
    bufs = _SYNTH_BUFS.get((n, h, w))
    if bufs is None:
        bufs = (np.empty((n, h, w), np.uint8), np.empty((n, h, w), np.uint8))
        _SYNTH_BUFS[(n, h, w)] = bufs
    pages, binaries = bufs
    _synth_range(pages, binaries, np.random.RandomState(seed), h, w,
                 line_height, 0, n)
    return pages, binaries, line_height


def synthesize_corpus(n, h, w, seed=0, budget=None, chunk=48):
    """Budgeted incremental corpus synthesis for the sustained modes.

    An 18 GB corpus first-touches at cold-page-fault speed, which on this
    host's starvation phases can run at single-digit MB/s — untracked,
    that eats the whole watchdog before any measurement begins.  Pages
    generate in ``chunk``-sized pieces against a wall budget; on overrun
    the corpus truncates to the pages already built (still distinct,
    recorded as such in the JSON).  Returns (pages, binaries,
    line_height, n_done)."""
    line_height = 50
    bufs = _SYNTH_BUFS.get((n, h, w))
    if bufs is None:
        bufs = (np.empty((n, h, w), np.uint8), np.empty((n, h, w), np.uint8))
        _SYNTH_BUFS[(n, h, w)] = bufs
    pages, binaries = bufs
    rng = np.random.RandomState(seed)
    t0 = time.perf_counter()
    done = 0
    while done < n:
        stop = min(done + chunk, n)
        _synth_range(pages, binaries, rng, h, w, line_height, done, stop)
        done = stop
        _partial["corpus_pages_done"] = 0  # gen, not measurement
        elapsed = time.perf_counter() - t0
        if elapsed > 20 and (done % (chunk * 4) == 0 or done == n):
            print(f"  synth: {done}/{n} pages in {elapsed:.0f}s", file=sys.stderr)
        if budget is not None and elapsed > budget and done < n:
            print(f"  synth: gen budget {budget:.0f}s exceeded at {done}/{n} "
                  "pages; truncating corpus (still distinct)", file=sys.stderr)
            break
    return pages, binaries, line_height, done


def phase_stats(intervals, batch_pages: int) -> dict:
    """Auditable phase statistics from per-batch completion intervals.

    The 1-core host runs through minutes-long starvation phases and the
    tunneled link swings several-x (docs/PERFORMANCE.md §5), so a single
    whole-run number under-describes a run.  Every derived figure here is
    recomputable from the shipped ``batch_s`` list:

    * ``pages_per_sec_steady``   = median per-batch rate over
      intervals[1:] (first batch = pipeline spin-up; rates first, THEN
      median — an even-length window's median averages two rates, so
      this is not interchangeable with batch/median(intervals));
    * ``pages_per_sec_second_half`` = the same over the second half of
      intervals[1:] — the run warmed up;
    * ``pages_per_sec_top_phase``   = best contiguous quarter-length
      window by pages/time (the healthy-phase capability).

    ``batch_pages`` is the uniform batch size, or a per-interval page
    count sequence when the final batch is ragged (shipped as
    ``batch_pages`` in the stats so every rate stays recomputable).
    """
    if not intervals:
        return {}
    arr = np.asarray(intervals, dtype=np.float64)
    # per-interval page counts: a scalar means uniform batches; a sequence
    # handles the ragged final batch (corpus % batch != 0), which would
    # otherwise be counted as a full batch and skew every derived rate
    pages = np.asarray(
        batch_pages if np.ndim(batch_pages) else [batch_pages] * len(arr),
        dtype=np.float64,
    )
    rates = pages / np.maximum(arr, 1e-12)
    # drop the spin-up batch whenever there is more than one interval (the
    # shipped policy string promises [1:], so the code must match even for
    # 2-interval runs)
    steady = rates[1:] if len(rates) > 1 else rates
    half = len(steady) // 2
    second = steady[half:] if half else steady
    win = max(1, len(arr) // 4)
    t_csum = np.concatenate([[0.0], np.cumsum(arr)])
    p_csum = np.concatenate([[0.0], np.cumsum(pages)])
    window_t = t_csum[win:] - t_csum[:-win]
    window_p = p_csum[win:] - p_csum[:-win]
    top = float((window_p / np.maximum(window_t, 1e-12)).max()) if len(window_t) else 0.0
    out = {
        "batch_s": [round(float(t), 3) for t in arr],
        "pages_per_sec_steady": round(float(np.median(steady)), 2),
        "pages_per_sec_second_half": round(float(np.median(second)), 2),
        "pages_per_sec_top_phase": round(top, 2),
        "phase_policy": "steady=median of per-batch pages/s over batch_s[1:] "
                        "(rates first, then median — for even-length windows "
                        "this differs from batch/median(batch_s[1:])); "
                        "second_half=same over the second half of batch_s[1:]; "
                        "top_phase=best contiguous quarter-length window "
                        "(sum pages / sum s)",
    }
    if np.ndim(batch_pages) and len(pages) and not np.all(pages == pages[0]):
        out["batch_pages"] = [int(p) for p in pages]
    return out


def fcn_skip_flops_per_page(h: int, w: int) -> float:
    """Analytic MXU FLOPs of one FCNSkip forward at the padded shape
    (2·H·W·Cin·Cout·kh·kw per conv; channel plan of reference model.py:45-92)."""
    convs = [
        # (scale divisor, cin, cout, kh, kw)
        (1, 1, 20, 5, 5), (1, 20, 30, 5, 5),          # conv1, conv2
        (2, 30, 40, 5, 5), (2, 40, 40, 5, 5),          # conv3, conv4
        (4, 40, 60, 5, 5), (4, 60, 60, 5, 5),          # conv5, conv6
        (8, 60, 80, 5, 5),                              # conv7
        (8, 80, 80, 5, 5),                              # deconv1 (s=1)
        (4, 80, 60, 2, 2),                              # deconv2 (s=2, out res /4)
        (4, 120, 40, 5, 5),                             # deconv3
        (2, 100, 30, 2, 2),                             # deconv4
        (1, 70, 20, 2, 2),                              # deconv5
        (1, 50, 3, 1, 1),                               # logits
    ]
    total = 0.0
    for div, cin, cout, kh, kw in convs:
        total += 2.0 * (h // div) * (w // div) * cin * cout * kh * kw
    return total


# bf16 matmul peak of one TPU v5e (v5 lite) chip
PEAK_FLOPS = 394e12


def main():
    parser = argparse.ArgumentParser()
    # batch 48 measured ~40% faster than 24 on the tunneled v5e (fewer
    # link round-trips per page; 96/48 = 2 batches per rep still overlap)
    parser.add_argument("--pages", type=int, default=96)
    parser.add_argument("--batch", type=int, default=48)
    parser.add_argument("--height", type=int, default=3508)  # A4 @ 300 DPI
    parser.add_argument("--width", type=int, default=2480)
    parser.add_argument("--target-line-height", type=int, default=6)
    parser.add_argument("--host-decimate", type=int, default=8)
    parser.add_argument("--download", default="packed", choices=["color", "pred", "packed"])
    parser.add_argument("--cc-vote", action="store_true",
                        help="ALSO run the cc-majority vote (BASELINE's optional "
                             "connected-components config; placement chosen by "
                             "--cc-vote-backend, default host).  Off by default, "
                             "matching the reference's default predict (no "
                             "--post_process chain)")
    parser.add_argument("--cc-vote-backend", default="host",
                        choices=["xla", "pallas", "host"],
                        help="host (default): native C union-find vote inside the "
                             "overlapped finish stage — measured 142/179 pages/s vs "
                             "the device backends (~0.9x of no-vote); xla: pure-XLA "
                             "segmented-scan labeler fused into the dispatch; pallas: "
                             "VMEM-resident kernel, downloads serialized (tunnel "
                             "workaround)")
    parser.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    parser.add_argument("--int8", action="store_true",
                        help="run the int8-quantized predict program "
                             "(models/quant.py; calibrates on the first batch)")
    parser.add_argument("--s2d-stem", action="store_true",
                        help="exact space-to-depth rewrite of the full-res stem convs "
                             "(models/s2d.py): 144-deep MXU contraction instead of 25")
    # the tunneled link AND the 1-core host fluctuate several-x between
    # reps (starvation phases measured minutes long); many cheap reps over
    # a longer window keep the median robust — the time budget still
    # bounds the loop, and the full rep list ships in the JSON
    parser.add_argument("--repeats", type=int, default=45)
    parser.add_argument("--skip-train", action="store_true",
                        help="omit the train-step throughput side metric")
    parser.add_argument("--mode", default="predict", choices=["predict", "train"],
                        help="train mode reports train-step pages/sec instead")
    parser.add_argument("--corpus", type=int, default=0,
                        help="sustained distinct-page mode: stream N distinct pages "
                             "(never repeated) with per-stage wall-clock — host prep / "
                             "upload / device / download / host finish — attributing "
                             "any degradation to transport vs framework.  Prints its "
                             "own JSON line and exits")
    parser.add_argument("--synth-on-device", action="store_true",
                        help="with --corpus: synthesize page content on device from a "
                             "per-batch seed and download only a checksum, taking the "
                             "link out of the loop entirely (isolates framework+device "
                             "cost)")
    parser.add_argument("--sustained", type=int, default=1008,
                        help="after the headline reps, stream this many distinct "
                             "never-repeated full-resolution pages through the "
                             "PRODUCTION 3-stage pipeline (prep+upload / dispatch "
                             "/ download+finish overlapped) and embed whole-run + "
                             "per-batch phase stats in the headline JSON "
                             "(BASELINE config #5 evidence; 0 = off)")
    parser.add_argument("--sustained-vote", action="store_true", default=True,
                        help="the default single sustained pass runs WITH the "
                             "cc-majority vote (host union-find backend — the "
                             "production config); --no-sustained-vote swaps it "
                             "for the plain (no-vote) pass instead")
    parser.add_argument("--no-sustained-vote", dest="sustained_vote",
                        action="store_false")
    parser.add_argument("--sustained-plain", action="store_true",
                        help="ALSO run the plain (no-vote) sustained pass "
                             "before the vote pass (two passes, the pre-r4 "
                             "default; off by default to fit the driver budget)")
    parser.add_argument("--attribution", type=int, default=0,
                        help="after the sustained runs, also run this many "
                             "distinct pages UNPIPELINED with block_until_ready "
                             "stage boundaries (gen/prep/upload/device/download/"
                             "finish medians -> degradation attribution + "
                             "mfu_device; 0 = off, the default — builder "
                             "sessions record it with --attribution 528)")
    parser.add_argument("--no-preflight", dest="preflight", action="store_false",
                        default=True,
                        help="skip the pre-warmup tunnel-health probe loop "
                             "(auto-skipped when JAX_PLATFORMS=cpu)")
    parser.add_argument("--sustained-budget", type=float, default=300.0,
                        help="per-pass wall budget for each pipelined sustained "
                             "run; exceeded = stop and mark truncated")
    parser.add_argument("--gen-budget", type=float, default=420.0,
                        help="wall budget for synthesizing the sustained corpus "
                             "(first-touch of ~18 GB runs at cold-fault speed, "
                             "minutes in host starvation phases); on overrun the "
                             "corpus truncates to the distinct pages built")
    parser.add_argument("--time-budget", type=float, default=360.0,
                        help="stop repeating once this many measured seconds "
                             "elapsed (host starvation phases last minutes — "
                             "a window this long usually samples both sides "
                             "of a phase boundary)")
    parser.add_argument("--corpus-budget", type=float, default=300.0,
                        help="stop a --corpus/--sustained pass after this many "
                             "seconds (checked between batches); the summary is "
                             "then marked truncated with the pages completed")
    parser.add_argument("--hard-timeout", type=float, default=1100.0,
                        help="watchdog PROCESS budget: if the measuring child "
                             "exceeds this wall-clock (the tunneled link can "
                             "wedge inside a blocking transfer, where no "
                             "cooperative budget fires), the forked parent "
                             "prints a JSON line from the last checkpoint and "
                             "exits 0.  Default 1100 s fires before any "
                             "plausible driver budget (the r3 in-process "
                             "2200 s default never got to; VERDICT r3 #1). "
                             "0 = off")
    args = parser.parse_args()

    # fork FIRST (before jax import: no threads/TPU client yet) — the
    # parent becomes the watchdog process, the child measures
    _supervise(args.hard_timeout)
    t_bench = time.monotonic()

    def remaining():
        if args.hard_timeout <= 0:
            return float("inf")
        return args.hard_timeout - (time.monotonic() - t_bench)

    preflight = None
    if args.preflight and os.environ.get("JAX_PLATFORMS", "") != "cpu":
        budget = min(600.0, 0.55 * args.hard_timeout) if args.hard_timeout > 0 else 600.0
        # the healthy-window wait is bounded tighter than the wedge wait:
        # a degraded link still measures (slower), a wedged one cannot
        healthy_budget = (min(240.0, 0.25 * args.hard_timeout)
                          if args.hard_timeout > 0 else 240.0)
        preflight = preflight_link_probe(budget, healthy_budget=healthy_budget)
        print(f"preflight: {json.dumps(preflight)}", file=sys.stderr)
        # a run that starts mid-wedge measures with what's left: trim the
        # rep window and the long passes to the remaining watchdog budget
        if args.hard_timeout > 0:
            left = remaining() - 120.0  # safety margin for warmup+final IO
            args.time_budget = max(60.0, min(args.time_budget, 0.4 * left))
            args.gen_budget = max(45.0, min(args.gen_budget, 0.45 * left))
            args.sustained_budget = max(
                45.0, min(args.sustained_budget, 0.35 * left))
            if left < 300.0:
                args.repeats = min(args.repeats, 12)
                if args.sustained:
                    print("preflight: <300s of watchdog budget left — "
                          "skipping the sustained pass", file=sys.stderr)
                    args.sustained = 0

    import jax

    # persistent XLA compile cache: repeat bench runs skip the ~2 min
    # first-compile of the fused pipeline
    jax.config.update("jax_compilation_cache_dir", "/tmp/ps_tpu_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from page_segmentation_tpu.core.colors import DEFAULT_IMAGE_MAP
    from page_segmentation_tpu.inference.pipeline import ThroughputPredictor
    from page_segmentation_tpu.models.fcn import FCNSkip

    compute_dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    module = FCNSkip(n_classes=3, dtype=compute_dtype, s2d_stem=args.s2d_stem)

    if args.mode == "train":
        _partial["stage"] = "train"
        _checkpoint()
        result = bench_train(args, module, compute_dtype)
        _partial["emitted"] = True
        _checkpoint()
        return result
    if args.corpus:
        _partial["stage"] = "corpus"
        _checkpoint()
        result = bench_corpus(args, module, compute_dtype, args.corpus)
        _partial["emitted"] = True
        _checkpoint()
        return result

    pages, binaries, line_height = synthesize_pages(args.pages, args.height, args.width)
    scale = args.target_line_height / line_height

    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1), jnp.float32))["params"]
    predictor = ThroughputPredictor(
        module,
        params,
        DEFAULT_IMAGE_MAP.palette,
        (args.height, args.width),
        scale,
        host_decimate=args.host_decimate,
        compute_dtype=compute_dtype,
        download=args.download,
        cc_vote=args.cc_vote_backend if args.cc_vote else False,
        int8=args.int8,
        reuse_output_buffers=True,  # bench discards trios immediately
    )
    print(f"normalized page: {predictor.fused.valid_shape}", file=sys.stderr)

    # warmup: compile + pipeline spin-up on a small slice
    _partial["stage"] = "warmup"
    _checkpoint()
    warm_start = time.perf_counter()
    warm = min(args.batch, args.pages)
    for _ in predictor.run(pages[:warm], binaries[:warm], batch_size=args.batch):
        pass
    print(f"warmup (compile) {time.perf_counter() - warm_start:.1f}s", file=sys.stderr)

    # repeat with a time budget: the tunneled link to this chip fluctuates
    # by several x between runs; report the median (headline) and the best
    # (pipeline capability)
    rates = _partial["rates"]  # shared with the watchdog
    _partial["stage"] = "headline reps"
    _checkpoint()
    # unique content per rep: the tunneled chip content-addresses whole
    # transfers and replays identical inputs from a cache — repeated
    # content times dishonestly and can replay Pallas-bearing programs as
    # empty buffers.  Only the DECIMATED array is uploaded, and the box
    # mean absorbs single-pixel changes, so the whole top-left decimation
    # block of every page is set to a rep-distinct value: the uploaded
    # content provably differs every rep, at ~64 byte-writes/page.  (The
    # np.roll/np.take variants this replaces moved ~1.7 GB per rep
    # outside the timer, which the 1-core host's starvation phases
    # stretched to minutes, expiring the time budget after 1-2 reps.)
    d = args.host_decimate
    measure_start = time.perf_counter()
    for rep in range(args.repeats):
        pages[:, :d, :d] = (rep + 1) % 256
        # the vote configs ALSO upload a 1-bit ink mask sampled on the
        # normalized grid: encode the rep number into eight d-wide blocks
        # of the top rows so at least one sampled ink bit per block flips
        # and the packed-ink upload is novel per rep too
        for b in range(8):
            binaries[:, :d, b * d : (b + 1) * d] = 255 * (((rep + 1) >> b) & 1)
        pages_rep, binaries_rep = pages, binaries
        start = time.perf_counter()
        total = 0
        for color, overlay, inverted in predictor.run(pages_rep, binaries_rep, batch_size=args.batch):
            total += color.shape[0]
        elapsed = time.perf_counter() - start
        rate = total / elapsed
        print(
            f"rep {rep}: {total} pages in {elapsed:.3f}s = {rate:.1f} pages/s "
            f"on {jax.devices()[0]}",
            file=sys.stderr,
        )
        rates.append(rate)
        _checkpoint()
        if time.perf_counter() - measure_start > args.time_budget:
            break
    # rep 0 consistently measures pipeline spin-up (first-touch page
    # faults, lazy tunnel state), not steady state: report it but exclude
    # it from the headline median when enough steady reps exist.  The
    # policy is declared in the JSON ("median_policy") so the headline
    # number is auditable against the full rep list.
    drop_spinup = len(rates) > 2
    steady = rates[1:] if drop_spinup else rates
    median = float(np.median(steady))
    best = float(np.max(rates))
    # phase figures for the headline mode, computed HERE so every number a
    # reader meets in README/ROADMAP traces to a field in the bench JSON
    # (recomputable from the shipped rep list)
    half = len(steady) // 2
    median_second_half = float(np.median(steady[half:])) if half else median
    win = max(1, len(steady) // 4)
    median_top_phase = max(
        float(np.median(steady[i : i + win]))
        for i in range(len(steady) - win + 1)
    )
    pad_h, pad_w = predictor.fused.padded_shape
    flops_page = fcn_skip_flops_per_page(pad_h, pad_w)
    mfu = median * flops_page / PEAK_FLOPS
    print(
        f"median {median:.1f} best {best:.1f} pages/s; "
        f"{flops_page / 1e9:.2f} GFLOP/page -> MFU {mfu * 100:.3f}% of "
        f"{PEAK_FLOPS / 1e12:.0f} TF/s bf16 peak (e2e incl. host+link)",
        file=sys.stderr,
    )
    result = {
        "metric": "predict_pages_per_sec_per_chip",
        "value": round(median, 2),
        "unit": "pages/sec",
        "vs_baseline": round(median / 50.0, 3),
        "best": round(best, 2),
        "reps": [round(r, 1) for r in rates],
        "median_policy": "median over reps[1:] (rep 0 = pipeline spin-up)"
                         if drop_spinup else "median over all reps",
        "median_second_half": round(median_second_half, 2),
        "median_top_phase": round(median_top_phase, 2),
        "phase_policy": "median_second_half=median of the steady reps' second "
                        "half; median_top_phase=max over contiguous "
                        "quarter-length windows of the window median",
        "gflop_per_page": round(flops_page / 1e9, 2),
        "mfu_e2e": round(mfu, 5),
        # host context: the pipeline's prep/finish stages and all thread
        # overlap run on the host CPU; a 1-core host serializes them
        # (observed this round) and bounds e2e pages/s regardless of the
        # device
        "host_cpus": __import__("os").cpu_count(),
    }
    if preflight:
        result["preflight"] = preflight
    # the watchdog ships whatever sections land in this dict if a later
    # pass wedges inside a blocking transfer; from this checkpoint on, a
    # wedge/kill still records the full headline median
    _partial["sections"] = result
    _checkpoint()
    if not args.skip_train:
        _partial["stage"] = "train side metric"
        _checkpoint()
        result["train_pages_per_sec_per_chip"] = bench_train(args, module, compute_dtype, emit=False)
        _checkpoint()
    if args.sustained and remaining() < 150.0:
        print(f"sustained: skipped ({remaining():.0f}s of watchdog budget "
              "left after the headline)", file=sys.stderr)
        result["sustained_skipped"] = "watchdog budget"
        args.sustained = 0
    if args.sustained:
        # BASELINE config #5 evidence in every recorded bench: stream a
        # distinct never-repeated corpus through the PRODUCTION pipeline
        # (the 3-stage overlap users actually run), whole-run wall + the
        # per-batch interval list so a degraded phase is visible in the
        # artifact itself, not just in prose
        _partial["stage"] = "sustained gen"
        _checkpoint()
        s_pages, s_binaries, _, n_gen = synthesize_corpus(
            args.sustained, args.height, args.width, seed=20_000,
            budget=args.gen_budget, chunk=args.batch,
        )
        s_pages, s_binaries = s_pages[:n_gen], s_binaries[:n_gen]
        # the default records ONE pass — the cc-majority-vote config (the
        # production setup: host union-find backend inside the overlapped
        # finish stage).  --no-sustained-vote swaps in the plain pass;
        # --sustained-plain runs both (the pre-r4 default, now opt-in so
        # the default run fits the driver budget with margin)
        run_plain = args.sustained_plain or not args.sustained_vote
        if run_plain:
            _partial["stage"] = "sustained corpus (pipelined)"
            _checkpoint()
            result["sustained"] = bench_sustained_pipelined(
                args, predictor, s_pages, s_binaries, flops_page
            )
            result["sustained"]["pages_requested"] = args.sustained
            if n_gen < args.sustained:
                result["sustained"]["gen_truncated"] = True
            _checkpoint()
        if args.sustained_vote:
            _partial["stage"] = "sustained corpus (cc-vote)"
            _checkpoint()
            if run_plain:
                # one decimation block per page is rewritten so every
                # upload is novel vs the plain pass (the tunnel content-
                # addresses transfers, docs/PERFORMANCE.md §2); a freshly
                # generated corpus needs no rewrite
                d = args.host_decimate
                s_pages[:, :d, :d] = 201
                for b in range(8):
                    s_binaries[:, :d, b * d : (b + 1) * d] = 255 * ((201 >> b) & 1)
            from page_segmentation_tpu.core.colors import DEFAULT_IMAGE_MAP
            from page_segmentation_tpu.inference.pipeline import ThroughputPredictor

            vote_predictor = ThroughputPredictor(
                module,
                predictor.variables,
                DEFAULT_IMAGE_MAP.palette,
                (args.height, args.width),
                scale,
                host_decimate=args.host_decimate,
                compute_dtype=compute_dtype,
                download=args.download,
                cc_vote="host",
                reuse_output_buffers=True,
                int8=args.int8,
            )
            # spin-up outside the timed pass (jit-cache hit: same program)
            warm_pages, warm_bins, _ = synthesize_pages(
                args.batch, args.height, args.width, seed=30_000
            )
            for _ in vote_predictor.run(warm_pages, warm_bins, batch_size=args.batch):
                pass
            result["sustained_vote"] = bench_sustained_pipelined(
                args, vote_predictor, s_pages, s_binaries, flops_page
            )
            # same truncated corpus as the plain line: mark it here too so
            # the vote artifact is self-describing
            result["sustained_vote"]["pages_requested"] = args.sustained
            if n_gen < args.sustained:
                result["sustained_vote"]["gen_truncated"] = True
            _checkpoint()
    if args.attribution:
        # unpipelined stage-attribution pass: block_until_ready boundaries
        # decompose each batch into gen/prep/upload/device/download/finish,
        # which is also where mfu_device comes from (the device stage alone)
        _partial["stage"] = "attribution corpus (unpipelined)"
        _checkpoint()
        args.synth_on_device = False
        att = bench_corpus(args, module, compute_dtype, args.attribution, emit=False)
        result["attribution"] = {
            "pages": att["pages"],
            "pages_per_sec": att["value"],
            "pages_per_sec_steady": att.get("pages_per_sec_steady"),
            "stage_ms_median": att["stage_ms_median"],
            "flat": bool(att["batch_s_median_second_half"]
                         <= 1.5 * att["batch_s_median_first_half"]),
        }
        if att.get("truncated"):
            result["attribution"]["truncated"] = True
        dev_ms = att["stage_ms_median"].get("device", 0.0)
        if dev_ms:
            device_rate = args.batch / (dev_ms / 1e3)
            result["device_stage_pages_per_sec"] = round(device_rate, 2)
            result["mfu_device"] = round(device_rate * flops_page / PEAK_FLOPS, 5)
    _partial["emitted"] = True
    _checkpoint()
    print(json.dumps(result), flush=True)
    _partial["printed"] = True  # the line is fully out: teardown crashes
    _checkpoint()               # must not trigger a second partial line


def bench_sustained_pipelined(args, predictor, pages, binaries, flops_page):
    """Stream a pre-synthesized distinct-page corpus through the production
    3-stage pipeline and time the whole run (first prep to last trio).

    Corpus synthesis stays OUTSIDE the clock — in production pages flow
    from disk, and the unpipelined ``--attribution`` pass measures gen
    explicitly.  Returns whole-run pages/s plus the full per-batch
    interval list (phase evidence lives in the artifact)."""
    corpus = pages.shape[0]
    intervals = []
    batch_counts = []
    done = 0
    truncated = False
    t0 = time.perf_counter()
    last = t0
    stream = predictor.run(pages, binaries, batch_size=args.batch)
    for color, _overlay, _inverted in stream:
        now = time.perf_counter()
        intervals.append(now - last)
        batch_counts.append(int(color.shape[0]))
        last = now
        done += color.shape[0]
        _partial["corpus_pages_done"] = done
        _checkpoint()
        if now - t0 > args.sustained_budget and done < corpus:
            truncated = True
            stream.close()
            break
    wall = last - t0
    value = done / wall if wall > 0 else 0.0
    out = {
        "pages": done,
        "mode": "pipelined (production 3-stage overlap, distinct pages)",
        "pages_per_sec": round(value, 2),
        "vs_baseline": round(value / 50.0, 3),
        "mfu_e2e": round(value * flops_page / PEAK_FLOPS, 5),
    }
    # per-batch counts, not the nominal size: the final batch can be ragged
    # (corpus % batch != 0) and must not count as a full batch in the rates
    out.update(phase_stats(intervals, batch_counts))
    if truncated:
        out["truncated"] = True
        out["note"] = f"TRUNCATED at --sustained-budget {args.sustained_budget:.0f}s"
    print(
        f"sustained[{'vote' if predictor.cc_vote else 'plain'}]: {done} pages "
        f"in {wall:.2f}s = {value:.1f} pages/s whole-run "
        f"(steady {out.get('pages_per_sec_steady')}, "
        f"top phase {out.get('pages_per_sec_top_phase')})",
        file=sys.stderr,
    )
    return out


def bench_corpus(args, module, compute_dtype, corpus, emit=True):
    """Sustained distinct-page throughput (BASELINE config #5: 1k-page
    corpus).  Unlike the headline bench (a small page set rolled per rep,
    which sits in the tunnel's content-cache-friendly regime), every page
    here is distinct and seen once.  Stages run unpipelined with
    block_until_ready boundaries so each batch decomposes into

        prep (host decimate+ink) / upload (device_put) / device (dispatch)
        / download (np.asarray) / finish (host trio)

    and any throughput degradation attributes to a specific stage —
    transport stages (upload/download) versus framework stages
    (prep/device/finish).  With --synth-on-device the link leaves the
    loop entirely: pages are synthesized on device from a per-batch seed
    and only a checksum is downloaded, proving (or refuting) that
    framework+device time is flat over the corpus.
    """
    import jax
    import jax.numpy as jnp

    from page_segmentation_tpu.core.colors import DEFAULT_IMAGE_MAP
    from page_segmentation_tpu.inference.pipeline import ThroughputPredictor

    scale = args.target_line_height / 50
    predictor = ThroughputPredictor(
        module,
        module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1), jnp.float32))["params"],
        DEFAULT_IMAGE_MAP.palette,
        (args.height, args.width),
        scale,
        host_decimate=args.host_decimate,
        compute_dtype=compute_dtype,
        download=args.download,
        cc_vote=(args.cc_vote_backend if args.cc_vote else False),
        reuse_output_buffers=True,  # the corpus loop drops each trio
    )
    n_batches = -(-corpus // args.batch)
    print(f"corpus: {corpus} distinct pages, {n_batches} x {args.batch}, "
          f"synth_on_device={args.synth_on_device}", file=sys.stderr)

    if args.synth_on_device:
        dec_h, dec_w = predictor.decimated_shape

        @jax.jit
        def synth(key):
            # novel uint8 content per batch: the tunnel content-addresses
            # transfers AND dispatches, so inputs must differ every time
            return jax.random.randint(
                key, (args.batch, dec_h, dec_w), 0, 256, dtype=jnp.int32
            ).astype(jnp.uint8)

        @jax.jit
        def forward_checksum(variables, pages_dev, palette):
            out = predictor.fused(variables, pages_dev, palette)
            return jnp.sum(out.astype(jnp.int32))

        key = jax.random.PRNGKey(7)
        # one split for the whole corpus: per-batch fold_in dispatches a
        # tiny device op whose round-trip latency (seconds in bad tunnel
        # phases) would otherwise dominate the measured wall
        subkeys = jax.device_get(jax.random.split(key, n_batches + 1))
        # warmup/compile
        jax.block_until_ready(forward_checksum(
            predictor.variables, synth(jnp.asarray(subkeys[-1])), predictor.palette_dev))
        from collections import deque

        times = []
        truncated = False
        pending = deque()  # keep a few batches in flight: dispatch
        t_corpus = time.perf_counter()  # latency overlaps device compute
        for i in range(n_batches):
            if i and time.perf_counter() - t_corpus > args.corpus_budget:
                truncated = True
                break
            start = time.perf_counter()
            checksum = forward_checksum(
                predictor.variables, synth(jnp.asarray(subkeys[i])), predictor.palette_dev)
            pending.append((start, checksum))
            if len(pending) > 3:
                begun, done = pending.popleft()
                int(done)  # 8-byte download; blocks
                times.append(time.perf_counter() - begun)
                _partial["corpus_pages_done"] = len(times) * args.batch
            if (i + 1) % 5 == 0 and times:
                print(f"  batch {i + 1}/{n_batches}: {times[-1] * 1e3:.0f} ms "
                      f"(3 in flight)", file=sys.stderr)
        while pending:
            begun, done = pending.popleft()
            int(done)
            times.append(time.perf_counter() - begun)
        wall = time.perf_counter() - t_corpus
        pages_done = len(times) * args.batch
        _partial["corpus_pages_done"] = pages_done
        half = len(times) // 2
        if half:
            first, second = float(np.median(times[:half])), float(np.median(times[half:]))
        else:
            first = second = float(np.median(times)) if times else 0.0
        result = {
            "metric": "corpus_device_pages_per_sec_per_chip",
            "value": round(pages_done / wall, 2),
            "unit": "pages/sec",
            "vs_baseline": round(pages_done / wall / 50.0, 3),
            "pages": pages_done,
            "batch_ms_median_first_half": round(first * 1e3, 1),
            "batch_ms_median_second_half": round(second * 1e3, 1),
            "flat": bool(second <= 1.5 * first),
            "note": "on-device synthesis + checksum download (3 batches in "
                    "flight): link excluded; per-batch medians include "
                    "in-flight wait; flat=framework+device time stable "
                    "over the corpus",
        }
        if truncated:
            result["truncated"] = True
            result["note"] += f"; TRUNCATED at --corpus-budget {args.corpus_budget:.0f}s"
        if emit:
            print(json.dumps(result), flush=True)
            _partial["printed"] = True
            _checkpoint()
        return result

    # full stack, distinct pages, per-stage attribution
    stage_names = ("gen", "prep", "upload", "device", "download", "finish")
    stages = {k: [] for k in stage_names}
    from page_segmentation_tpu import native

    # warmup/compile on a throwaway batch
    pages, binaries, _ = synthesize_pages(args.batch, args.height, args.width, seed=10_000)
    for _ in predictor.run(pages, binaries, batch_size=args.batch):
        pass

    t_corpus = time.perf_counter()
    done = 0
    truncated = False
    for i in range(n_batches):
        if i and time.perf_counter() - t_corpus > args.corpus_budget:
            truncated = True
            break
        t0 = time.perf_counter()
        m = min(args.batch, corpus - done)
        pages, binaries, _ = synthesize_pages(m, args.height, args.width, seed=i)
        t1 = time.perf_counter()
        dec = native.decimate_u8(pages, predictor.host_decimate)
        if dec is not None:
            dec = dec[:, : predictor.decimated_shape[0], : predictor.decimated_shape[1]]
            ink = native.gather_ink(binaries, predictor.row_idx, predictor.col_idx).astype(bool)
        else:  # no native lib: PIL/numpy fallback (same as pipeline._prep)
            from PIL import Image

            dh, dw = predictor.decimated_shape
            dec = np.empty((m, dh, dw), np.uint8)
            ink = np.empty((m, len(predictor.row_idx), len(predictor.col_idx)), bool)
            for j in range(m):
                dec[j] = np.asarray(
                    Image.fromarray(pages[j]).reduce(predictor.host_decimate))[:dh, :dw]
                ink[j] = binaries[j][np.ix_(predictor.row_idx, predictor.col_idx)] < 128
        ink_packed = predictor._pack_ink(ink) if predictor.cc_vote else None
        t2 = time.perf_counter()
        dec_dev = jax.block_until_ready(jax.device_put(dec))
        ink_dev = (jax.block_until_ready(jax.device_put(ink_packed))
                   if ink_packed is not None else None)
        t3 = time.perf_counter()
        if predictor.cc_vote:
            out_dev = predictor.fused(
                predictor.variables, dec_dev, predictor.palette_dev, ink_dev)
        else:
            out_dev = predictor.fused(predictor.variables, dec_dev, predictor.palette_dev)
        jax.block_until_ready(out_dev)
        t4 = time.perf_counter()
        downloaded = np.asarray(out_dev)
        t5 = time.perf_counter()
        predictor._finish(downloaded, ink)
        t6 = time.perf_counter()
        for name, dt in zip(stage_names,
                            (t1 - t0, t2 - t1, t3 - t2, t4 - t3, t5 - t4, t6 - t5)):
            stages[name].append(dt)
        done += m
        _partial["corpus_pages_done"] = done  # live: the watchdog reports it
        _checkpoint()
        if (i + 1) % 3 == 0:
            batch_ms = (t6 - t1) * 1e3  # gen excluded: corpus-IO simulation
            print(
                f"  batch {i + 1}/{n_batches}: {batch_ms:.0f} ms "
                + " ".join(f"{k}={stages[k][-1] * 1e3:.0f}" for k in stage_names),
                file=sys.stderr,
            )
    wall = time.perf_counter() - t_corpus
    _partial["corpus_pages_done"] = done
    gen_total = sum(stages["gen"])
    measured = wall - gen_total  # pages flow from disk in production, not synth
    per_stage = {k: round(float(np.median(v)) * 1e3, 1) for k, v in stages.items()}
    totals = {k: round(sum(v), 2) for k, v in stages.items()}
    n_done = len(stages["prep"])
    batch_times = [sum(stages[k][j] for k in stage_names[1:]) for j in range(n_done)]
    half = len(batch_times) // 2
    if half:
        first = float(np.median(batch_times[:half]))
        second = float(np.median(batch_times[half:]))
    else:
        first = second = float(np.median(batch_times)) if batch_times else 0.0
    transport = totals["upload"] + totals["download"]
    framework = totals["prep"] + totals["device"] + totals["finish"]
    # phase-robust steady figure: the 1-core host's starvation phases last
    # minutes, so a run that opens inside one halves "value" while the
    # second-half median shows the actual steady cost per batch
    steady = round(args.batch / second, 2) if second else 0.0
    result = {
        "metric": "corpus_sustained_pages_per_sec_per_chip",
        "value": round(done / measured, 2),
        "unit": "pages/sec",
        "vs_baseline": round(done / measured / 50.0, 3),
        "pages": done,
        "pages_per_sec_steady": steady,
        "stage_ms_median": per_stage,
        "stage_s_total": totals,
        "transport_s": round(transport, 2),
        "framework_s": round(framework, 2),
        "batch_s_median_first_half": round(first, 3),
        "batch_s_median_second_half": round(second, 3),
        "note": "unpipelined per-stage attribution over distinct never-repeated "
                "pages; gen (host corpus synthesis) excluded from the rate",
        "host_cpus": __import__("os").cpu_count(),
    }
    if truncated:
        result["truncated"] = True
        result["note"] += f"; TRUNCATED at --corpus-budget {args.corpus_budget:.0f}s"
    if emit:
        print(json.dumps(result), flush=True)
        _partial["printed"] = True
        _checkpoint()
    return result


def bench_train(args, module, compute_dtype, emit=True):
    """Secondary metric: device training throughput (pages/sec) on
    normalized-page batches with unique data per step (the tunnel caches
    identical dispatches, so inputs must vary)."""
    import jax
    import jax.numpy as jnp
    import optax

    from page_segmentation_tpu.models.registry import Optimizers
    from page_segmentation_tpu.train.metrics import Loss
    from page_segmentation_tpu.train.steps import make_step_fns

    from page_segmentation_tpu.models.registry import Architecture

    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1), jnp.float32))["params"]
    optimizer = optax.inject_hyperparams(
        lambda learning_rate: Optimizers.ADAM.make(learning_rate)
    )(learning_rate=1e-4)
    opt_state = optimizer.init(params)
    train_step, _ = make_step_fns(
        module, optimizer, Loss.CATEGORICAL_CROSSENTROPY(),
        device_preprocess=Architecture.FCN_SKIP.device_preprocess(),
    )

    batch_size, h, w = args.batch, 424, 304

    def make_batch(seed):
        # compact transfer layout: uint8 pixels/masks + valid dims
        # (~4x fewer bytes over the link than f32 image + i32 mask + f32
        # weights; normalization and the weights map happen on device)
        r = np.random.RandomState(seed)
        return {
            "image": jax.device_put(r.randint(0, 256, (batch_size, h, w, 1)).astype(np.uint8)),
            "mask": jax.device_put(r.randint(0, 3, (batch_size, h, w)).astype(np.uint8)),
            "binary": jax.device_put(np.ones((batch_size, h, w), np.uint8)),
            "dims": jax.device_put(np.tile(np.int32([h, w]), (batch_size, 1))),
        }

    batches = [make_batch(i) for i in range(6)]
    key = jax.random.PRNGKey(0)
    params, state, opt_state, metrics = train_step(params, {}, opt_state, batches[0], key)
    jax.block_until_ready(metrics["loss"])

    steps = 18
    start = time.perf_counter()
    for i in range(steps):
        key, sub = jax.random.split(key)
        params, state, opt_state, metrics = train_step(
            params, state, opt_state, batches[i % len(batches)], sub
        )
    jax.block_until_ready(metrics["loss"])
    elapsed = time.perf_counter() - start
    pages_per_sec = steps * batch_size / elapsed
    print(f"{steps} steps x {batch_size} pages in {elapsed:.2f}s", file=sys.stderr)
    if not emit:
        return round(pages_per_sec, 2)
    print(
        json.dumps(
            {
                "metric": "train_pages_per_sec_per_chip",
                "value": round(pages_per_sec, 2),
                "unit": "pages/sec",
                "vs_baseline": round(pages_per_sec / 50.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
