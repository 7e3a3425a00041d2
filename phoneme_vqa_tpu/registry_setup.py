"""Import every module that registers executors/models/datasets/tokenizers.

Importing this module populates the string-keyed registries used by run.py
(the dict-registry equivalent of the reference's
`core/executor/__init__.py` re-export + getattr dispatch, which — note —
ships broken for PhonemePreSTU: `/root/reference/core/executor/__init__.py:10`
imports a dataset instead of the executor, making that mode unlaunchable).
"""

from . import tokenizers  # noqa: F401
from .data import latr as _latr_data  # noqa: F401
from .data import prestu as _prestu_data  # noqa: F401
from .models import latr as _latr_model  # noqa: F401
from .models import prestu as _prestu_model  # noqa: F401
from .train import latr_executor as _latr_exec  # noqa: F401
from .train import prestu_executor as _prestu_exec  # noqa: F401
from .data import sal as _sal_data  # noqa: F401
from .models import sal as _sal_model  # noqa: F401
from .train import sal_executor as _sal_exec  # noqa: F401
from .models import customized as _customized_models  # noqa: F401
from .train import customized_executor as _customized_exec  # noqa: F401
from .models import phoneme as _phoneme_models  # noqa: F401
from .train import phoneme_executor as _phoneme_exec  # noqa: F401

# reference dataset-name aliases: the Customized*/Phoneme* datasets are the
# stock featurizations parameterized by answer_encoder (see data/latr.py)
from .data.latr import LaTrDataset as _L
from .data.prestu import PreSTUDataset as _P
from .data.sal import SaLDataset as _S
from .utils.registry import DATASETS as _D

for _alias, _cls in {
    "CustomizedLaTrDataset": _L,
    "PhonemeLaTrDataset": _L,
    "CustomizedPreSTUDataset": _P,
    "PhonemePreSTUDataset": _P,
    "CustomizedSaLDataset": _S,
    "PhonemeSaLDataset": _S,
}.items():
    if _alias not in _D:
        _D._entries[_alias] = _cls
