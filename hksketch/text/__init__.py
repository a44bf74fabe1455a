from .tokenize import tokenize_column, tokenize_text
from .extract import extract_text_column

__all__ = ["tokenize_column", "tokenize_text", "extract_text_column"]
