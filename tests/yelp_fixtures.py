"""Back-compat shim: fixtures moved into the package so the driver
query `yelp_basetable` can build them too."""

from big_data_tools_spark.pipeline.fixtures import *  # noqa: F401,F403
from big_data_tools_spark.pipeline.fixtures import yelp_tables  # noqa: F401
