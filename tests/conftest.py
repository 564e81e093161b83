from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ia_hadoop_tools_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark(app_name="ia-hadoop-tools-spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


#: Ground-truth CDX lines from the reference's own unit fixtures
#: (src/test/java/org/archive/hadoop/pig/CDXLoaderTest.java:59-60,86-87,103-104).
CDX_HEADER = " CDX N b a m s k r M S V g"
CDX_LINE_PLAIN = (
    "101,78,123,109)/robots.txt 20120103084508 http://109.123.78.101/robots.txt "
    "text/html 404 22RZA2NQT3RZUCQYJYZDPVZRNYIR72SN - - 561 55426267 "
    "WIDE-20120103083324-crawl410/WIDE-20120103083324-00000.warc.gz"
)
#: 12 raw tokens -> the redirect field contains an unescaped space.
CDX_LINE_SPACE_REDIRECT = (
    "131,125,136,219)/ 20120103084049 http://219.136.125.131/ text/html 302 "
    "3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ http://219.136.125.131/selfLogon.do?hoge=1 2 "
    "- 449 34133512 WIDE-20120103083324-crawl410/WIDE-20120103083324-00000.warc.gz"
)
#: Bare CR inside the redirect field (preserved by LF-only reading).
CDX_LINE_CR_REDIRECT = (
    "131,125,136,219)/ 20120103084049 http://219.136.125.131/ text/html 302 "
    "3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ http://219.136.125.131/self\rLogon.do "
    "- 449 34133512 WIDE-20120103083324-crawl410/WIDE-20120103083324-00000.warc.gz"
)


@pytest.fixture()
def cdx_lines_df(spark):
    lines = [CDX_HEADER, CDX_LINE_PLAIN, CDX_LINE_SPACE_REDIRECT]
    return spark.createDataFrame([(l,) for l in lines], "value: string")
