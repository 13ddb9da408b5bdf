"""Independent torch re-implementations of the custom audio stack.

Each module here is translated DIRECTLY from the Swift reference
(/root/reference/package/...), deliberately without looking at the JAX
implementations in tpu_audio/ — a third implementation catches shared
misreadings that two implementations by the same author cannot
(VERDICT round-2 #2). Used only by tests/test_torch_parity_audio.py.
"""
