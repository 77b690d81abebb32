"""Prompt-editing schedule parser: A1111 `get_prompt_schedule` semantics.

Expected values re-derived from the documented A1111 behavior (the
reference repo has no prompt editing; this is beyond-reference surface).
"""
import numpy as np
import pytest

from pww_tpu.conditioning.prompt_editing import (
    combined_schedule,
    has_editing,
    schedule_prompts,
)


def g(text, steps=10):
    return [[e, p] for e, p in schedule_prompts(text, steps)]


def test_plain_prompt_single_entry():
    assert g("test") == [[10, "test"]]


def test_fractional_switch():
    assert g("a [b:.5] c") == [[5, "a  c"], [10, "a b c"]]


def test_absolute_switch():
    assert g("a [b:3]") == [[3, "a "], [10, "a b"]]


def test_from_to_form():
    assert g("a [b:c:4] d") == [[4, "a b d"], [10, "a c d"]]


def test_remove_form():
    assert g("a [b::6] c") == [[6, "a b c"], [10, "a  c"]]


def test_nested_plain_brackets_left_verbatim():
    assert g("a [[[b]]:2]") == [[2, "a "], [10, "a [[b]]"]]


def test_attention_group_atomic():
    assert g("[(a:2):3]") == [[3, ""], [10, "(a:2)"]]


def test_alternation_cycles_every_step():
    assert g("[cat|dog]", 4) == [[1, "cat"], [2, "dog"], [3, "cat"], [4, "dog"]]


def test_alternation_three_way():
    assert g("[a|b|c]", 5) == [
        [1, "a"], [2, "b"], [3, "c"], [4, "a"], [5, "b"],
    ]


def test_nested_schedule_inside_alternation():
    # step 1: x; step 2: [y:z:1] at step 2 -> z; step 3: x; step 4: z
    assert g("[x|[y:z:1]]", 4) == [[1, "x"], [2, "z"], [3, "x"], [4, "z"]]


def test_two_schedules_union_of_boundaries():
    assert g("[a:b:2] [c:d:6]", 8) == [
        [2, "a c"], [6, "b c"], [8, "b d"],
    ]


def test_non_editing_brackets_untouched():
    # attention-decrease syntax has no trailing :number and no pipe
    assert g("a [b] c") == [[10, "a [b] c"]]
    assert not has_editing("a [b] c")
    assert has_editing("a [b:2] c")
    assert not has_editing("plain text")


def test_unbalanced_bracket_is_plain():
    assert g("a [b:2 c") == [[10, "a [b:2 c"]]


def test_combined_schedule_merges_pos_and_neg():
    got = combined_schedule("[a:b:3]", "[u:v:5]", 8)
    assert got == [(3, "a", "u"), (5, "b", "u"), (8, "b", "v")]


def test_combined_schedule_constant_negative():
    got = combined_schedule("[a:b:4]", "bad", 8)
    assert got == [(4, "a", "bad"), (8, "b", "bad")]


def test_schedule_nested_inside_plain_bracket_fires():
    """A1111's grammar is recursive: a schedule inside a de-emphasis
    bracket still switches; the literal brackets survive for downstream
    attention parsing."""
    assert g("[flowers [day:night:0.5]]") == [
        [5, "[flowers day]"],
        [10, "[flowers night]"],
    ]
    assert has_editing("[flowers [day:night:0.5]]")
    assert has_editing("[a [b|c]]")


def test_plain_bracket_without_inner_constructs_stays_verbatim():
    assert g("a [b (c:1.5)] d") == [[10, "a [b (c:1.5)] d"]]
    assert not has_editing("a [b (c:1.5)] d")
