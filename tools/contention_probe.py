"""Host-contention probe for matched-pair scaling legs.

The sandbox is a one-socket 32-core VM with bursty hypervisor steal that
/proc/stat does not reliably expose (the steal field reads 0 even on days
when identical back-to-back legs swing 2-4x — BENCH/NOISE.md).  So the
primary instrument is a *calibrated spin probe*: one thread repeatedly
times a fixed chunk of pure-integer work.  Hypervisor steal (or host
oversubscription) stretches the chunk's wall time regardless of what the
guest kernel accounts; with the leg using at most ~17 of 32 vCPUs the
probe always has a free core, so the leg itself does not slow it.

Instruments, sampled for the duration of one bench leg:

- spin (1 Hz, ~40 ms work/sample): wall time of a fixed arithmetic chunk.
  Calibrated once per invocation on the idle box (min of 40 chunks).
- steal (0.5 Hz): /proc/stat steal fraction per 2 s window.  Secondary —
  kept in the rule so that a kernel that DOES account steal still gates.
- membw (1/5 Hz): wall time of a fixed 16 MiB numpy copy.  DIAGNOSTIC
  ONLY — the leg's own memory traffic slows this probe differentially by
  leg width, so it must not gate acceptance; it is recorded to support
  (or refute) the one-socket bandwidth narrative after the fact.

Summary fields per leg (see ``ProbeSampler.summary``):

- ``spin_median_slow``   — leg-median chunk wall / calibrated wall.
- ``spin_burst_frac``    — fraction of ~5 s spin windows slower than
  1.35 x the LEG's OWN median (robust to sustained-frequency dips,
  which shift the median but are not bursts) WHILE the guest had idle
  cores (busy < 0.9) — i.e. externally-caused slowness only.  The
  undiscriminated rate is reported as ``spin_burst_frac_raw`` (probe v2:
  v1 gated on the raw rate and systematically over-rejected local[8]
  legs, whose own transient thread spikes queue the probe).
- ``steal_mean`` / ``steal_burst_frac`` — mean steal fraction, and the
  fraction of 2 s windows with steal >= 0.15.
- ``membw_median_slow`` — diagnostic, not gated.

The acceptance rule that consumes these lives in bench_scaling.py and is
PRE-REGISTERED: committed, with thresholds, before the round-5 campaign's
first measurement.
"""

from __future__ import annotations

import statistics
import threading
import time

SPIN_N = 800_000  # fixed chunk: ~50-60 ms of pure int work on this box


def _spin_chunk(n: int = SPIN_N) -> float:
    """Wall seconds for a fixed arithmetic chunk (allocation-free).

    A short warm-up spin precedes the timed region: after the sampler's
    1 s sleep the core is coming out of an idle state at reduced
    frequency, which would read as phantom slowdown.  The warm-up brings
    the core back to steady-state before timing starts (measured: without
    it an idle box reads median_slow ~1.17 vs a tight-loop calibration).
    """
    acc = 0
    for i in range(60_000):  # warm-up, untimed
        acc = (acc + i * i) & 0xFFFFFFFF
    t0 = time.perf_counter()
    for i in range(n):
        acc = (acc + i * i) & 0xFFFFFFFF
    dt = time.perf_counter() - t0
    if acc == -1:  # defeat hypothetical dead-code elimination; never true
        print(acc)
    return dt


def _read_stat():
    """(steal, idle+iowait, total) jiffies from the aggregate cpu line."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = list(map(int, parts[1:]))
        steal = vals[7] if len(vals) > 7 else 0
        idle = vals[3] + (vals[4] if len(vals) > 4 else 0)
        return steal, idle, sum(vals)
    except Exception:
        return 0, 0, 0


def calibrate_spin(trials: int = 30) -> float:
    """Idle-box calibration under SAMPLING conditions.

    Chunks are timed sleep-interleaved exactly as the sampler will time
    them (same idle-wake profile), and the MEDIAN is the baseline — so an
    idle leg's spin_median_slow reads ~1.00 by construction, and the
    thresholds in the pre-registered rule measure contention, not the
    calibration method.
    """
    samples = []
    for _ in range(trials):
        samples.append(_spin_chunk())
        time.sleep(0.2)
    return statistics.median(samples)


class ProbeSampler:
    """Samples spin / steal / membw in a daemon thread for one leg."""

    def __init__(self, spin_t0: float, membw_bytes: int = 16 * 1024 * 1024):
        self.spin_t0 = spin_t0
        self.membw_bytes = membw_bytes
        self.spin_samples: list[float] = []
        self.busy_samples: list[float] = []  # guest busy-core fraction per ~1 s
        self.steal_windows: list[float] = []
        self.membw_samples: list[float] = []
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def _loop(self) -> None:
        try:
            import numpy as np
            src = np.ones(self.membw_bytes // 8, dtype=np.float64)
            dst = np.empty_like(src)
        except Exception:
            src = dst = None
        prev_steal, prev_idle, prev_total = _read_stat()
        prev2_steal, prev2_idle, prev2_total = prev_steal, prev_idle, prev_total
        last_steal_t = last_membw_t = time.monotonic()
        while not self._stop.is_set():
            self.spin_samples.append(_spin_chunk())
            # guest busy fraction over the interval since the last sample:
            # the discriminator between EXTERNAL contention (probe slow while
            # the guest had idle cores → the hypervisor stole time) and the
            # leg's own transient thread spikes (guest fully busy → queueing
            # is self-induced and identical-by-design at both leg widths)
            cur_steal, cur_idle, cur_total = _read_stat()
            dtot = cur_total - prev2_total
            if dtot > 0:
                self.busy_samples.append(1.0 - (cur_idle - prev2_idle) / dtot)
            else:
                self.busy_samples.append(0.0)
            prev2_steal, prev2_idle, prev2_total = cur_steal, cur_idle, cur_total
            now = time.monotonic()
            if now - last_steal_t >= 2.0:
                dtot = cur_total - prev_total
                if dtot > 0:
                    self.steal_windows.append((cur_steal - prev_steal) / dtot)
                prev_steal, prev_idle, prev_total = cur_steal, cur_idle, cur_total
                last_steal_t = now
            if src is not None and now - last_membw_t >= 5.0:
                t0 = time.perf_counter()
                for _ in range(3):
                    dst[:] = src
                self.membw_samples.append((time.perf_counter() - t0) / 3)
                last_membw_t = now
            self._stop.wait(1.0)

    def __enter__(self) -> "ProbeSampler":
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)

    def summary(self) -> dict:
        s = self.spin_samples
        out: dict = {"n_spin": len(s), "n_steal": len(self.steal_windows)}
        if s:
            # aggregate ~1 Hz chunks into 5-chunk (~5 s) windows: single-chunk
            # scheduler jitter reaches 1.5x even on an idle box, but averages
            # out over a window, while a real steal burst (>=30 s historically)
            # spans many whole windows and stays visible
            wins = [
                sum(s[i : i + 5]) / len(s[i : i + 5]) for i in range(0, len(s), 5)
            ]
            b = self.busy_samples
            busy_wins = [
                sum(b[i : i + 5]) / len(b[i : i + 5]) for i in range(0, len(b), 5)
            ]
            busy_wins += [0.0] * (len(wins) - len(busy_wins))
            med = statistics.median(wins)
            out["n_spin_windows"] = len(wins)
            out["spin_median_slow"] = round(med / self.spin_t0, 4)
            # burst line at 1.35x the leg's own median: benign full-leg loads
            # measured windows up to ~1.26x (scheduler jitter), real steal
            # bursts 1.5-2.6x — 1.35 separates the populations with margin.
            # A slow window counts as an EXTERNAL burst only when the guest
            # itself had idle cores (busy < 0.9): with free cores a 1-thread
            # probe can only run slow if the hypervisor withheld time, while
            # a fully-busy guest means the leg's own transient thread spikes
            # (wider at local[8] than local[2]) queued the probe — a
            # self-signal, not host contention (probe v2; v1 rejected a
            # 313 s near-record large leg at 24% "bursts").
            slow = [x > 1.35 * med for x in wins]
            out["spin_burst_frac"] = round(
                sum(
                    1 for sl, bw in zip(slow, busy_wins) if sl and bw < 0.9
                ) / len(wins),
                4,
            )
            out["spin_burst_frac_raw"] = round(sum(slow) / len(wins), 4)
            out["busy_mean"] = round(sum(busy_wins) / len(busy_wins), 4)
            out["spin_max_slow"] = round(max(wins) / self.spin_t0, 4)
        if self.steal_windows:
            out["steal_mean"] = round(
                sum(self.steal_windows) / len(self.steal_windows), 5
            )
            out["steal_burst_frac"] = round(
                sum(1 for x in self.steal_windows if x >= 0.15)
                / len(self.steal_windows),
                4,
            )
        if self.membw_samples:
            bw_med = statistics.median(self.membw_samples)
            out["membw_median_slow"] = round(bw_med / min(self.membw_samples), 4)
            out["membw_max_slow"] = round(
                max(self.membw_samples) / min(self.membw_samples), 4
            )
        return out
