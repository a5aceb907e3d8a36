from .trainer import TrainState, Trainer, create_train_state

__all__ = ["TrainState", "Trainer", "create_train_state"]
