from quackpipe_spark.plans.compactor import Compactor, plan_merges  # noqa: F401
from quackpipe_spark.plans.index import FileEntry, PartitionIndex  # noqa: F401
