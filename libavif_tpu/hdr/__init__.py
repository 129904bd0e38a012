"""HDR subsystems: gain maps (ISO 21496-1) and sample transforms
(bit-depth extension to 16-bit). Reference: src/gainmap.c,
src/sampletransform.c (SURVEY.md §2.1)."""

from .sampletransform import (  # noqa: F401
    Recipe,
    Token,
    TokenType,
    apply_expression,
    expression_to_recipe,
    parse_sato,
    recipe_to_expression,
    write_sato,
)
