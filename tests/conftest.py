from __future__ import annotations

import pytest

from ocr_spark.fixtures.generator import ensure_fixtures
from ocr_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session("ocr-spark-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_dir() -> str:
    return ensure_fixtures("tiny")


@pytest.fixture(scope="session")
def small_dir() -> str:
    return ensure_fixtures("small")
