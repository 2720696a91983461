from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from engine.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("engine-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def pages_1k(tmp_path_factory):
    """Seed-stable 1k-doc pages parquet (FIXTURES.md section 1)."""
    from engine.synth import write_pages

    p = tmp_path_factory.mktemp("pages") / "pages_1k.parquet"
    write_pages(str(p), 1000)
    return str(p)


SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def plan_of(df, mode: str = "formatted") -> str:
    """Capture df.explain() output as a string (shared by plan-shape
    tests so the capture mechanics can't drift between files)."""
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()
