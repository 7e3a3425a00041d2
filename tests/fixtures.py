"""Synthetic fixtures now live in the package (phoneme_vqa_tpu.data.synthetic)
so the driver entry points can build real executors too; re-exported here for
the tests."""

from phoneme_vqa_tpu.data.synthetic import (  # noqa: F401
    ANSWERS,
    OCR_WORDS,
    QUESTIONS,
    make_latr_fixture,
    make_sal_fixture,
    tiny_latr_yaml,
    tiny_sal_yaml,
)
