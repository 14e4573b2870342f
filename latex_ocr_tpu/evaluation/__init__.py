from .text import (
    bleu_score,
    edit_distance,
    exact_match_score,
    levenshtein,
    score_files,
    truncate_end,
    write_answers,
)
from .image import img_edit_distance, score_dirs
from .report import analyze_answers, format_report

__all__ = [
    "analyze_answers",
    "bleu_score",
    "format_report",
    "edit_distance",
    "exact_match_score",
    "img_edit_distance",
    "levenshtein",
    "score_dirs",
    "score_files",
    "truncate_end",
    "write_answers",
]
