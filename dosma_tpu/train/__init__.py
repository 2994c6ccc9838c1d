from dosma_tpu.train.seg_trainer import SegTrainer, dice_bce_loss, make_sharded_train_step  # noqa: F401
