from __future__ import annotations

import pytest

from easy_solr4files_index_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("fts-tests", cpus=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
