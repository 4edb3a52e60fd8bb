"""Inverse rendering: gradient-based fitting of volume + transfer function."""
from volrt.train.fit import TrainState, fit, make_train_step  # noqa: F401
