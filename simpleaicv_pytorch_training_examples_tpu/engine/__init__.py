from .engine import (TrainState, init_model, make_train_step,
                     make_classification_eval_step, apply_pretrained)
