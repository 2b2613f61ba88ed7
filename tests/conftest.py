from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pgcapture_spark.session import get_spark  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session", autouse=True)
def _run_scoped_tmp():
    """Route every ``tempfile.mkdtemp`` (the querydefs' state / checkpoint /
    fixture roots) under ONE fresh per-process directory, so concurrent test
    sessions' Spark JVMs can never share a temp-path failure surface (the r8
    verdict's ``cdc_relation_learn`` flake: a checkpoint dir vanished while
    three sessions ran concurrently against bare ``/tmp`` roots)."""
    import shutil
    import tempfile

    root = tempfile.mkdtemp(prefix="pgcs_run_")
    old, tempfile.tempdir = tempfile.tempdir, root
    yield
    tempfile.tempdir = old
    # remove the run root too — without this every test session leaks its
    # private scratch tree into /tmp (ADVICE r9), the very class this
    # routing exists to prevent
    shutil.rmtree(root, ignore_errors=True)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="pgcapture-spark-tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()
