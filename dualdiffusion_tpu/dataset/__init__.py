from .dataloader import DatasetConfig, DualDiffusionDataset, custom_collate
from .processor import (DatasetProcessor, DatasetProcessorConfig,
                        DatasetProcessStage, WorkQueue)
from . import processes
