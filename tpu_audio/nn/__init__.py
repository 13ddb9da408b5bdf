from tpu_audio.nn import attention, layers, lstm, rope, transformer

__all__ = ["layers", "attention", "rope", "transformer", "lstm"]
