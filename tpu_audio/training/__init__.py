from tpu_audio.training.data import Batcher, Example, evaluate, featurize, shard, train
from tpu_audio.training.whisper import make_train_step

__all__ = ["make_train_step", "Batcher", "Example", "featurize", "shard",
           "evaluate", "train"]
