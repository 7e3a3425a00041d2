"""phoneme_vqa_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework for
Vietnamese scene-text Visual Question Answering with phoneme-level decoding.

Re-designed from scratch with the capabilities of the PyTorch reference
`hieunghia-pat/phoneme-VQA` (see SURVEY.md): the 3x3 model matrix
{LaTr, PreSTU, SaL} x {stock decode, customized decoder + pluggable answer
tokenizer, phoneme triple decode}, the Vietnamese phonology engine, four
answer tokenizers, train/eval/predict executors, and the
Accuracy/F1/BLEU/CIDEr/ROUGE metric suite.

The compute path is pure JAX: flax.linen models, KV-cached `lax.while_loop`
decoding, pjit/`shard_map` data parallelism over a named device mesh, and
Pallas kernels for the hot ops.
"""

__version__ = "0.1.0"
