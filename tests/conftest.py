"""Shared pytest fixtures: one session-scoped local SparkSession."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from newscrawler_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", app_name="newscrawler-tests", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def smoke_pages_pd():
    from newscrawler_spark.sources.fixtures import gen_pages_local

    return gen_pages_local("smoke")


@pytest.fixture(scope="session")
def smoke_seeds_pd():
    from newscrawler_spark.sources.fixtures import gen_seeds

    return gen_seeds("smoke")


@pytest.fixture(scope="session")
def smoke_pages(spark, smoke_pages_pd):
    from newscrawler_spark.sources.fixtures import PAGES_SCHEMA

    return spark.createDataFrame(smoke_pages_pd, schema=PAGES_SCHEMA)


@pytest.fixture(scope="session")
def smoke_seeds(spark, smoke_seeds_pd):
    from newscrawler_spark.sources.fixtures import SEEDS_SCHEMA

    return spark.createDataFrame(smoke_seeds_pd, schema=SEEDS_SCHEMA)


@pytest.fixture(scope="session")
def smoke_pages_e(spark, smoke_pages):
    from newscrawler_spark.runner import enrich_pages

    return enrich_pages(smoke_pages).cache()


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end tests")
