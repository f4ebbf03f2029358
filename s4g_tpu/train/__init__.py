from .optim import build_optimizer, build_lr_schedule
from .state import TrainState
from .trainer import Trainer
from .dataset import SceneGraspDataset, collate_scene
