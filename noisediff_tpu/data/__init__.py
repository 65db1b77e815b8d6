from .iso_ratio_mapping import COMBINATION_MAPPING
from .manifest import SidEntry, parse_sid_list, patch_grid
from .sampler import ShardedIterSampler
