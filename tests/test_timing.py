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
