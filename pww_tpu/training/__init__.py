from .textual_inversion import DEFAULT_TEMPLATES, TIResult, train_textual_inversion

__all__ = ["DEFAULT_TEMPLATES", "TIResult", "train_textual_inversion"]
