from posediffusion_tpu.data.co3d import (
    DEBUG_CATEGORIES,
    TEST_CATEGORIES,
    TRAINING_CATEGORIES,
    Co3dDataset,
    expand_categories,
)
from posediffusion_tpu.data.images import load_and_preprocess_images
from posediffusion_tpu.data.re10k import Re10KDataset
from posediffusion_tpu.data.sampler import (
    DEFAULT_FRAME_BUCKETS,
    DynamicBatchSampler,
    collate_batch,
    encode_batch_poses,
)
