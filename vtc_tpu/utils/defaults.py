"""Default paths and sample parameters, overridable by environment.

The reference hard-codes absolute personal paths (utils/defaults.py:7-15);
here everything derives from environment variables with sane fallbacks so
the framework is portable:

  VTC_LOGGING_DIR   root for run logs / checkpoints / tensorboard
  VTC_DATASET_DIR   root for raw datasets
"""
import os
from pathlib import Path

import numpy as np

logging_directory = Path(
    os.environ.get("VTC_LOGGING_DIR", "/tmp/vtc_tpu/logs"))
dataset_directory = Path(
    os.environ.get("VTC_DATASET_DIR", "/tmp/vtc_tpu/datasets"))

# Expected raw files for the three curated datasets the reference knows
# about; callers can pass explicit filepaths instead (see
# vtc_tpu.data.dataset_generation.create_patch_training_set).
raw_data_filepaths = {
    "Field_NW": dataset_directory / "Field_natural_images/unwhitened.mat",
    "vanHateren": dataset_directory / "vanHateren/curated.h5",
    "Kodak_BW": dataset_directory / "Kodak/kodak_full_images_training.p",
}

# handy gabor parameters for sampling a test dictionary element
gabor_params = {
    "patch_size": (16, 16),
    "gabor_parameters": {
        "orientation": np.pi / 4, "envelope_width": 3,
        "envelope_aspect": 0.5, "frequency": 1 / 4, "phase": 0,
        "position_yx": (0, 0)},
}
