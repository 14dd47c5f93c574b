"""Trainer orchestration loops for sparse coding, ICA, and PCA.

Host-side Python orchestrates schedules / checkpointing / logging; the
per-batch work (inference + dictionary update + statistics) is a single
compiled train step (see vtc_tpu.training.sparse_coding.build_train_step).
"""
