"""obs.trace_summary: rollup numerics on a synthetic Chrome trace."""
import gzip
import json

from mri_epilepsy_diagnosis_tpu.obs.trace_summary import (
    load_events, op_kind, summarize, top_ops)


def _fake_trace():
    meta = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 3, "tid": 1, "name": "thread_name",
         "args": {"name": "Steps"}},
        {"ph": "M", "pid": 3, "tid": 3, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 7, "name": "process_name",
         "args": {"name": "/host:CPU"}},
    ]
    ops = [
        # enclosing step span — must NOT count
        {"ph": "X", "pid": 3, "tid": 1, "name": "0", "dur": 1000.0},
        {"ph": "X", "pid": 3, "tid": 3, "name": "copy.1", "dur": 10.0},
        {"ph": "X", "pid": 3, "tid": 3, "name": "copy.2", "dur": 30.0},
        {"ph": "X", "pid": 3, "tid": 3, "name": "fusion.7", "dur": 50.0},
        # host-side python event — must NOT count
        {"ph": "X", "pid": 7, "tid": 9, "name": "copy.9", "dur": 99.0},
    ]
    return meta + ops


def test_summarize_rolls_up_op_lanes_only():
    events = _fake_trace()
    rollup, total = summarize(events)
    assert total == 90.0
    assert rollup["copy"] == (40.0, 2)
    assert rollup["fusion"] == (50.0, 1)
    assert "0" not in rollup  # step lane excluded


def test_top_ops_and_kind():
    events = _fake_trace()
    rows = top_ops(events, top=2)
    assert rows[0] == ("fusion.7", 50.0, 1)
    assert op_kind("dynamic-update-slice.312") == "dynamic-update-slice"
    assert op_kind("multiply_reduce_fusion") == "multiply_reduce_fusion"


def test_load_events_finds_gz(tmp_path):
    d = tmp_path / "plugins" / "profile" / "2026_01_01_00_00_00"
    d.mkdir(parents=True)
    with gzip.open(d / "vm.trace.json.gz", "wt") as fh:
        json.dump({"traceEvents": _fake_trace()}, fh)
    events = load_events(str(tmp_path))
    assert summarize(events)[1] == 90.0


def test_hlo_copy_attribution(capsys):
    from mri_epilepsy_diagnosis_tpu.obs.trace_summary import (
        hlo_copy_rows, hlo_shape_bytes, print_copy_report)

    assert hlo_shape_bytes("bf16[2,4,8]{2,1,0}") == 2 * 4 * 8 * 2
    assert hlo_shape_bytes("f32[10]") == 40
    assert hlo_shape_bytes("nonsense") == 0

    hlo = "\n".join([
        "HloModule jit_step",
        '  %copy.1 = bf16[2,8]{1,0} copy(%p0), metadata={op_name="jit(step)/convert"}',
        "  %add.2 = f32[4]{0} add(%a, %b)",
        '  %copy.2 = f32[16]{0} copy(%x), metadata={op_name="jit(step)/transpose"}',
        # computation-root copies are spelled with a ROOT prefix — they are
        # often the largest relayouts and must not be skipped
        '  ROOT %copy.3 = f32[32]{0} copy(%y), metadata={op_name="jit(step)/root"}',
    ])
    rows = hlo_copy_rows(hlo)
    assert [r[1] for r in rows] == ["copy.3", "copy.2", "copy.1"]
    assert rows[0][0] == 128 and rows[1][0] == 64 and rows[2][0] == 32
    assert rows[2][3].endswith("convert")
    assert rows[0][3].endswith("root")

    print_copy_report(rows, top=5, by_src_top=5)
    out = capsys.readouterr().out
    assert "3 copy ops" in out and "transpose" in out and "convert" in out
