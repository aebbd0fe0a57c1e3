from .factory import build_pix2poly
from .model import Decoder, Pix2Poly, ScoreNet, greedy_generate
from .tokenizer import TOKEN_MODE, Tokenizer

__all__ = [
    "Decoder",
    "Pix2Poly",
    "ScoreNet",
    "Tokenizer",
    "TOKEN_MODE",
    "build_pix2poly",
    "greedy_generate",
]
