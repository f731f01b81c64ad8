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


# ---------------------------------------------------------------------------
# optimized-HLO copy attribution (shared by experiments/copy_hunt.py and
# experiments/infer_copy_hunt.py): rank `copy` ops by byte volume and map
# each back to the JAX source line through its op_name metadata
# ---------------------------------------------------------------------------

_HLO_SHAPE = re.compile(r"(\w+)\[([\d,]*)\]")
_HLO_COPY = re.compile(r"(?:ROOT )?%?([\w.-]+) = ([^=]+?) copy\(")
_HLO_OP_NAME = re.compile(r'op_name="([^"]*)"')
_ELEM_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "s8": 1,
               "u8": 1, "f16": 2, "s64": 8, "u64": 8, "f64": 8}


def hlo_shape_bytes(shape_str: str) -> int:
    """Byte size of an HLO shape string like `bf16[2,97,97,97,64]{...}`."""
    m = _HLO_SHAPE.search(shape_str)
    if not m:
        return 0
    n = 1
    for d in m.group(2).split(","):
        if d:
            n *= int(d)
    return n * _ELEM_BYTES.get(m.group(1), 4)


def hlo_copy_rows(hlo_text: str) -> List[Tuple[int, str, str, str]]:
    """All `copy` ops in an optimized-HLO dump as (bytes, instruction name,
    shape string, JAX op_name metadata), largest first."""
    rows = []
    for line in hlo_text.splitlines():
        ls = line.strip()
        m = _HLO_COPY.match(ls)
        if not m:
            continue
        meta = _HLO_OP_NAME.search(ls)
        rows.append((hlo_shape_bytes(m.group(2)), m.group(1),
                     m.group(2).strip(), meta.group(1) if meta else "?"))
    rows.sort(reverse=True)
    return rows


_HLO_COLLECTIVE = re.compile(
    r"(?:ROOT )?%?([\w.-]+) = ([^=]+?) "
    r"(all-gather|all-reduce|reduce-scatter|collective-permute|all-to-all)"
    r"(?:-start)?\(")


def hlo_collective_rows(hlo_text: str) -> List[Tuple[int, str, str, str]]:
    """Every collective in an optimized (post-GSPMD) HLO dump as
    (output bytes, collective kind, instruction name, shape string),
    largest first.  The sharding gates use this to prove GSPMD inserted
    halo exchanges / grad reductions and NOT a full-volume all-gather —
    its favorite silent failure on spatially-partitioned convs."""
    rows = []
    for line in hlo_text.splitlines():
        m = _HLO_COLLECTIVE.match(line.strip())
        if not m:
            continue
        rows.append((hlo_shape_bytes(m.group(2)), m.group(3), m.group(1),
                     m.group(2).strip()))
    rows.sort(reverse=True)
    return rows


def print_copy_report(rows: List[Tuple[int, str, str, str]], top: int = 25,
                      by_src_top: int = 20) -> None:
    """Top copies by bytes + a rollup by source op_name tail component."""
    tot = sum(r[0] for r in rows)
    print(f"\n== {len(rows)} copy ops; total {tot / 1e9:.2f} GB/step ==")
    for b, name, shp, meta in rows[:top]:
        print(f"{b/1e6:9.1f} MB  {name:22s} {shp:44.44s} {meta[:90]}")
    by_src: Dict[str, Tuple[int, int]] = {}
    for b, name, shp, meta in rows:
        k = meta.split("/")[-1][:70] if meta != "?" else "?"
        t, c = by_src.get(k, (0, 0))
        by_src[k] = (t + b, c + 1)
    print("\n== copy bytes by source op_name (tail component) ==")
    for k, (b, c) in sorted(by_src.items(),
                            key=lambda kv: -kv[1][0])[:by_src_top]:
        print(f"{b/1e6:9.1f} MB {c:4d}x  {k}")


def print_trace_report(trace_dir: str, iters: int,
                       hlo_rows: Optional[List[Tuple[int, str, str, str]]]
                       = None, kinds_top: int = 16, ops_top: int = 25,
                       header_extra: str = "") -> float:
    """Per-step op-kind rollup + top individual ops, cross-referencing op
    instances against `hlo_rows` when given.  Returns total device us."""
    events = load_events(trace_dir)
    rollup, total = summarize(events)
    print(f"\n== trace rollup ({total / iters / 1e3:.1f} ms/step"
          f"{header_extra}) ==")
    for kind, (t, c) in sorted(rollup.items(),
                               key=lambda kv: -kv[1][0])[:kinds_top]:
        print(f"{kind:40s} {t/iters/1e3:8.2f} ms/step "
              f"{100*t/total:5.1f}% {c:6d}")
    print("\n== top individual device ops ==")
    hlo_names = {name: (shp, meta)
                 for _, name, shp, meta in (hlo_rows or [])}
    for name, t, c in top_ops(events, top=ops_top):
        extra = ""
        if name in hlo_names:
            shp, meta = hlo_names[name]
            extra = f"  <- {shp[:30]} {meta[-60:]}"
        print(f"{name:36.36s} {t/iters/1e3:8.2f} ms/step{extra}")
    return total


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
