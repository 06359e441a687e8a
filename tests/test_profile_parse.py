"""Unit tests for benchmarks/profile_step.py's trace parser — the
round-4 artifacts were mechanically wrong (nested spans double-counted,
names unclassifiable); these pin the fixed semantics on a synthetic
perfetto trace so the parser is validated before burning chip time."""

import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from benchmarks.profile_step import (_exclusive_spans, classify,  # noqa: E402
                                     parse_trace)


def test_exclusive_spans_nesting():
    # parent [0, 100], child A [10, 40], child B [50, 80],
    # grandchild of A [20, 30]
    events = [
        (0.0, 100.0, "parent", {}),
        (10.0, 30.0, "childA", {}),
        (20.0, 10.0, "grand", {}),
        (50.0, 30.0, "childB", {}),
    ]
    out = dict((n, d) for n, d, _ in _exclusive_spans(events))
    assert out["grand"] == 10.0
    assert out["childA"] == 20.0   # 30 - 10
    assert out["childB"] == 30.0
    assert out["parent"] == 40.0   # 100 - 30 - 30
    assert sum(out.values()) == 100.0


def test_exclusive_spans_sequential():
    events = [(0.0, 10.0, "a", {}), (10.0, 10.0, "b", {}),
              (20.0, 5.0, "a", {})]
    out = _exclusive_spans(events)
    agg = {}
    for n, d, _ in out:
        agg[n] = agg.get(n, 0.0) + d
    assert agg == {"a": 15.0, "b": 10.0}


def test_classify_scoped_names():
    assert classify("tcnn_scatter_mm_r256.123", {}) == "grid bwd: MXU scatter"
    assert classify("tcnn_gather_mmx_r1024.7", {}) == "grid fwd: MXU gather"
    assert classify("tcnn_adam.9", {}) == "Adam"
    assert classify("tcnn_mlp_bwd.2", {}) == "MLP bwd"
    assert classify("while.7", {}) == "step framing (scan/jit wrapper)"
    # args-based fallback: the row name is a sanitized fusion name but
    # the op metadata carries the scope path.
    assert classify("jvp__.89", {"long_name":
                    "jit(loop)/while/body/tcnn_scatter_mm_r256/..."}) \
        == "grid bwd: MXU scatter"
    assert classify("fusion.12", {}) == "XLA elementwise/fusion"


def test_parse_trace_end_to_end(tmp_path):
    n_steps = 2
    trace = {"traceEvents": [
        {"ph": "M", "pid": 1, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 9, "name": "process_name",
         "args": {"name": "/host:python"}},
        # device lane: jit wrapper > while > kernels
        {"ph": "X", "pid": 1, "tid": 0, "ts": 0.0, "dur": 100.0,
         "name": "jit_loop(123)"},
        {"ph": "X", "pid": 1, "tid": 0, "ts": 0.0, "dur": 100.0,
         "name": "while.7"},
        {"ph": "X", "pid": 1, "tid": 0, "ts": 0.0, "dur": 60.0,
         "name": "tcnn_scatter_mm_r256.1"},
        {"ph": "X", "pid": 1, "tid": 0, "ts": 60.0, "dur": 40.0,
         "name": "tcnn_adam.2"},
        # host lane must be ignored
        {"ph": "X", "pid": 9, "tid": 0, "ts": 0.0, "dur": 999.0,
         "name": "python_host_thing"},
    ]}
    d = tmp_path / "t"
    os.makedirs(d / "plugins" / "profile" / "x", exist_ok=True)
    p = d / "plugins" / "profile" / "x" / "foo.trace.json.gz"
    with gzip.open(p, "wt") as f:
        json.dump(trace, f)
    per_step, sample_args, step_ms, _ = parse_trace(str(d), n_steps)
    assert step_ms == 100.0 / n_steps / 1e3
    # exclusive: while.7 and jit_loop get 0 exclusive, kernels full
    assert abs(per_step["tcnn_scatter_mm_r256.1"] - 60.0 / 2 / 1e3) < 1e-9
    assert abs(per_step["tcnn_adam.2"] - 40.0 / 2 / 1e3) < 1e-9
    assert per_step["while.7"] == 0.0
    assert per_step["jit_loop(123)"] == 0.0
    assert "python_host_thing" not in per_step
