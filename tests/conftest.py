from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from pdf_extract_spark.session import get_spark

    s = get_spark(master="local[8]", app_name="pdf-extract-tests",
                  shuffle_partitions=8)
    yield s
    s.stop()
