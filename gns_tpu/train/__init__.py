from gns_tpu.train.trainer import TrainState, make_train_step, train  # noqa: F401
