from .partitioning import salt_skewed_keys, size_balanced_bins  # noqa: F401
from .lineage import PartitionLedger, extract_with_resume, read_extracted  # noqa: F401
