from gpemsr_tpu.data.datasets import CREMIDataset, IndexerDataset, VQGANDataset
from gpemsr_tpu.data.sampler import EpochShardSampler, Loader
