"""Build the 3-part (onset/rhyme/tone) phoneme vocabulary from annotations.

CLI equivalent of the reference's run-as-script vocab builder
(`/root/reference/decode/vocab_builder.py:114-121`).

Usage:
    python scripts/build_phoneme_vocab.py --out phoneme_vocab.json \
        ann_train.json ann_dev.json [...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from phoneme_vqa_tpu.phonology.vocab import VocabBuilder


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("annotations", nargs="+", help="annotation JSON files")
    parser.add_argument("--out", default="phoneme_vocab.json")
    args = parser.parse_args()

    builder = VocabBuilder(args.annotations)
    builder.save_vocab(args.out)
    sizes = {k: len(v) for k, v in builder.vocab.items()}
    print(f"Saved {args.out}: {sizes}")


if __name__ == "__main__":
    main()
