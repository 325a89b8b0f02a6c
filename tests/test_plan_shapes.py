"""Plan-shape regression pins (VERDICT r3 next #8): the physical-plan
properties the 100 TB design depends on — pushdown, codegen, map-side
combine, broadcast joins, TakeOrderedAndProject, no Python / no cartesian
products in hot paths — asserted in CI. The checklist is SHARED with
scripts/explain_audit.py (which renders it into PLANS.md), so the audit
and the gate cannot drift apart."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.explain_audit import (  # noqa: E402
    QUERY_AUDIT, hot_path_section, query_section)

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present")


@pytest.fixture()
def noaqe(spark):
    """Plans are inspected PRE-execution; AQE hides codegen ids there, so
    the audit runs with it off (the engine itself runs with AQE on)."""
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield spark
    spark.conf.set("spark.sql.adaptive.enabled", old)


def _assert_checks(title, plan, checks):
    failed = [label for label, ok in checks if not ok]
    assert not failed, f"{title}: failed plan checks {failed}\n{plan}"


def test_hot_path_plan_shape(noaqe, tmp_path):
    _assert_checks(*hot_path_section(noaqe, str(tmp_path / "log")))


@pytest.mark.parametrize("name", sorted(QUERY_AUDIT))
def test_query_plan_shape(noaqe, name):
    _assert_checks(*query_section(noaqe, SF_DIR, name))
