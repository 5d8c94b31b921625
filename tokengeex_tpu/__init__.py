"""tokengeex_tpu — TPU-native tokenizer training & inference framework.

A from-scratch JAX/XLA/Pallas re-implementation of the capabilities of
rojas-diego/tokengeex: unigram-LM tokenization (trie-matched lattices,
Viterbi segmentation, forward-backward EM) re-designed for TPUs as
dense match-table + scan kernels over packed byte streams, scaled over
device meshes with XLA collectives.

Public API mirrors the reference Python bindings
(reference: bindings/python/src/lib.rs:39-224, bindings/python/tokengeex.pyi).
"""

from .core.processors import (
    CrlfProcessor,
    Processor,
    UnicodeProcessor,
    load_processors,
)
from .core.splitter import split_special_tokens
from .core.tokenizer import Tokenizer
from .core.types import (
    BOS_TOKEN_ID,
    EOS_TOKEN_ID,
    NoPathError,
    ScoredToken,
    TokenGeeXError,
    TokenIdOutOfBoundsError,
    make_vocab,
    new_default_vocab,
)
from .models.oracle import Lattice, OracleModel, Trie
from .models.unigram import Model


def __getattr__(name):
    # Lazy access to the training layer (keeps plain tokenization
    # imports free of jax/numpy-heavy modules).
    if name == "VocabularyGenerator":
        from .train.generate import VocabularyGenerator

        return VocabularyGenerator
    if name == "VocabularyPruner":
        from .train.prune import VocabularyPruner

        return VocabularyPruner
    if name == "VocabularyMerger":
        from .train.merge import VocabularyMerger

        return VocabularyMerger
    if name == "VocabularyFilter":
        from .train.filter import VocabularyFilter

        return VocabularyFilter
    if name == "IdiomMiner":
        from .train.mine import IdiomMiner

        return IdiomMiner
    raise AttributeError(name)


__version__ = "0.1.0"

__all__ = [
    "BOS_TOKEN_ID",
    "EOS_TOKEN_ID",
    "CrlfProcessor",
    "Lattice",
    "Model",
    "NoPathError",
    "OracleModel",
    "Processor",
    "ScoredToken",
    "TokenGeeXError",
    "TokenIdOutOfBoundsError",
    "Tokenizer",
    "Trie",
    "UnicodeProcessor",
    "load_processors",
    "make_vocab",
    "new_default_vocab",
    "split_special_tokens",
]


def load(filepath: str) -> Tokenizer:
    """Load a tokenizer from a v2.0 JSON file."""
    return Tokenizer.from_file(filepath)
