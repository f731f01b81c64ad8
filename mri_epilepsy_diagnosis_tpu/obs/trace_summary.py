"""Profiler-trace rollups without TensorBoard.

`jax.profiler` traces (see `obs.profile.profile_trace`) dump a Chrome-trace
JSON per host under `<logdir>/plugins/profile/<ts>/*.trace.json.gz`.  The
usual viewer is TensorBoard's profile plugin, which this image does not
ship — this module parses the JSON directly and rolls device-side op time
up by op kind, which is how the packed-layout optimisation rounds located
their bottlenecks (relayout copies, dynamic-update-slice chains, transpose
fusions; CLAUDE.md round-3 notes).

CLI:
    python -m mri_epilepsy_diagnosis_tpu.obs.trace_summary /tmp/trace \
        [--top 25] [--iters 10] [--device-substr TPU]

Replaces: nothing in the reference (its profiling was wall-clock prints,
`utils/routine.py:52,72`).
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import re
from typing import Dict, List, Optional, Tuple

_SUFFIX = re.compile(r"[.\d]+$")


def _find_trace_file(path: str) -> str:
    """Accept a trace file, a profiler logdir, or a `plugins/profile/<ts>`
    dir; return the newest `*.trace.json.gz` under it."""
    if os.path.isfile(path):
        return path
    hits = sorted(
        glob.glob(os.path.join(path, "*.trace.json.gz"))
        + glob.glob(os.path.join(path, "plugins", "profile", "*",
                                 "*.trace.json.gz")),
        key=os.path.getmtime)
    if not hits:
        raise FileNotFoundError(f"no *.trace.json.gz under {path}")
    return hits[-1]


def load_events(path: str) -> List[dict]:
    f = _find_trace_file(path)
    opener = gzip.open if f.endswith(".gz") else open
    with opener(f, "rt") as fh:
        return json.load(fh)["traceEvents"]


def op_kind(name: str) -> str:
    """Canonical op kind: strip XLA's numeric instance suffix
    (`dynamic-update-slice.312` -> `dynamic-update-slice`)."""
    return _SUFFIX.sub("", name) or name


def _op_lanes(events: List[dict], device_substr: str) -> set:
    """(pid, tid) pairs of 'XLA Ops' lanes on matching devices — the lanes
    holding individual op timings (the 'Steps'/'XLA Modules' lanes are
    enclosing spans and would double-count)."""
    pids = {e["pid"] for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and device_substr in e.get("args", {}).get("name", "")}
    lanes = {(e["pid"], e["tid"]) for e in events
             if e.get("ph") == "M" and e.get("name") == "thread_name"
             and e["pid"] in pids
             and e.get("args", {}).get("name") == "XLA Ops"}
    # traces without lane metadata (other runtimes): fall back to all lanes
    return lanes or {(e["pid"], e.get("tid")) for e in events
                     if e.get("ph") == "X" and e.get("pid") in pids}


def summarize(events: List[dict], device_substr: str = "TPU",
              ) -> Tuple[Dict[str, Tuple[float, int]], float]:
    """Roll complete ('X') events on the device 'XLA Ops' lanes up by op
    kind.  Returns ({kind: (total_us, count)}, total_device_us).
    `device_substr` selects the device by its process name (e.g. 'TPU')."""
    lanes = _op_lanes(events, device_substr)
    rollup: Dict[str, Tuple[float, int]] = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in lanes:
            continue
        dur = float(e.get("dur", 0.0))
        kind = op_kind(e.get("name", "?"))
        t, c = rollup.get(kind, (0.0, 0))
        rollup[kind] = (t + dur, c + 1)
        total += dur
    return rollup, total


def top_ops(events: List[dict], device_substr: str = "TPU", top: int = 25,
            ) -> List[Tuple[str, float, int]]:
    """Individual op instances (un-stripped names) by total time."""
    lanes = _op_lanes(events, device_substr)
    agg: Dict[str, Tuple[float, int]] = {}
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in lanes:
            continue
        name = e.get("name", "?")
        t, c = agg.get(name, (0.0, 0))
        agg[name] = (t + float(e.get("dur", 0.0)), c + 1)
    rows = sorted(((n, t, c) for n, (t, c) in agg.items()),
                  key=lambda r: -r[1])
    return rows[:top]


def print_summary(path: str, top: int = 25, iters: Optional[int] = None,
                  device_substr: str = "TPU") -> None:
    events = load_events(path)
    rollup, total = summarize(events, device_substr)
    div = iters or 1
    unit = "us/iter" if iters else "us"
    print(f"device total: {total / div / 1e3:.2f} m{unit[1:]}"
          f"  ({len(rollup)} op kinds)")
    print(f"{'op kind':42s} {'time':>12s} {'share':>7s} {'count':>7s}")
    for kind, (t, c) in sorted(rollup.items(), key=lambda kv: -kv[1][0])[:top]:
        print(f"{kind:42.42s} {t / div / 1e3:9.2f} m{unit[1:]} "
              f"{100 * t / total:6.1f}% {c:7d}")
    print("\ntop individual ops:")
    for name, t, c in top_ops(events, device_substr, top=min(top, 15)):
        print(f"{name:42.42s} {t / div / 1e3:9.2f} m{unit[1:]} "
              f"{100 * t / total:6.1f}% {c:7d}")


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("path", help="trace file, logdir, or plugins/profile dir")
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--iters", type=int, default=None,
                   help="divide times by this (per-step numbers)")
    p.add_argument("--device-substr", default="TPU")
    args = p.parse_args(argv)
    print_summary(args.path, args.top, args.iters, args.device_substr)


if __name__ == "__main__":
    main()
