import shutil
import tempfile

import pytest

from entity_resolution_pipeline_spark.session import get_spark
from entity_resolution_pipeline_spark.sources.pages import synth_pages, synth_pages_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cores=16, shuffle_partitions=16, app_name="erps-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixtures_pd():
    return synth_pages(n_clusters=100, seed=42)


@pytest.fixture(scope="session")
def fixtures(spark):
    return synth_pages_spark(spark, n_clusters=100, seed=42)


@pytest.fixture(scope="session")
def tmp_root():
    d = tempfile.mkdtemp(prefix="erps-tests-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


SF_TINY = "/root/testdata/sf0.001"
SF_SMALL = "/root/testdata/sf0.01"
