"""ProvingProcessInfo timing tree (reference util/proving_process_info.rs)."""

import time

from plonky2_goldibear_tpu.utils.timing import (ProvingProcessInfo,
                                                StatisticsItem, timed)


def test_scope_nesting_and_durations():
    t = ProvingProcessInfo("prove")
    with timed(t, "phase a"):
        with timed(t, "inner"):
            time.sleep(0.005)
    with timed(t, "phase b"):
        time.sleep(0.005)
    t.close()

    assert [c.name for c in t.children] == ["phase a", "phase b"]
    assert [c.name for c in t.children[0].children] == ["inner"]
    assert t.duration() >= t.children[0].duration()
    assert t.children[0].duration() >= t.children[0].children[0].duration()
    assert t.open_stack() == ""


def test_open_stack_reports_deepest_open_scope():
    t = ProvingProcessInfo("prove")
    t.push("outer")
    t.push("deep")
    assert t.open_stack() == "prove > outer > deep"
    t.pop()
    assert t.open_stack() == "prove > outer"
    t.close()


def test_statistics_and_none_timing():
    t = ProvingProcessInfo()
    t.incr(StatisticsItem.PERM_ARG_RETRIES)
    t.incr(StatisticsItem.PERM_ARG_RETRIES)
    assert t.statistics[StatisticsItem.PERM_ARG_RETRIES] == 2
    # timed(None, ...) is a no-op passthrough
    with timed(None, "anything"):
        pass


def test_print_renders_indented_tree():
    t = ProvingProcessInfo("root")
    with timed(t, "child"):
        pass
    t.close()
    lines = t.lines()
    assert lines[0].endswith("to root")
    assert lines[1].startswith("  ") and lines[1].endswith("to child")


def test_context_tree_gate_counts():
    """ContextTree gate-count profiler (reference util/context_tree.rs)."""
    from plonky2_goldibear_tpu.plonk.builder import CircuitBuilder
    from plonky2_goldibear_tpu.plonk.config import CircuitConfig
    from plonky2_goldibear_tpu.utils.context_tree import context

    b = CircuitBuilder(CircuitConfig.standard_recursion_config_gl())
    x = b.add_virtual_target()
    with context(b, "square chain"):
        y = x
        for _ in range(30):
            y = b.mul(y, y)
        with context(b, "inner add"):
            y = b.add(y, x)
    with context(b, "empty scope"):
        pass
    report = b.print_gate_counts(min_delta=1)
    assert "square chain" in report
    assert "inner add" in report
    assert "empty scope" not in report           # filtered by min_delta
    assert report.startswith(f"{b.num_gates()} gates to root")
