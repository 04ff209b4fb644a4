"""Dataset layer: readers, filters, feature caches, stage caching."""

from autoinst_tpu.datasets.base import Dataset, DatasetConfig, DatasetEntry
from autoinst_tpu.datasets.filters import (ApplyPose, Filter, FilterList,
                                           KittiGTMovingObjectFilter,
                                           RangeFilter)
from autoinst_tpu.datasets.kitti import (KittiOdometryDataset,
                                         KittiOdometryDatasetConfig,
                                         create_kitti_odometry_dataset)
