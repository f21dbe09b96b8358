"""Prompt templates (reference preprocess_data_supervised.py:27-38,
duplicated at preprocess_data_unsupervised.py:27-38 — centralized here)."""

PROMPT_INPUT = (
    "Below is an instruction that describes a task, paired with an input "
    "that provides further context. "
    "Write a response that appropriately completes the request.\n\n"
    "### Instruction:\n{}\n\n### Input:\n{}\n\n### Response:"
)

PROMPT_NO_INPUT = (
    "Below is an instruction that describes a task. "
    "Write a response that appropriately completes the request.\n\n"
    "### Instruction:\n{}\n\n### Response:"
)


def format_prompt(instruction: str, input_text: str = "") -> str:
    if input_text:
        return PROMPT_INPUT.format(instruction, input_text)
    return PROMPT_NO_INPUT.format(instruction)


def format_full(instruction: str, input_text: str, output: str) -> str:
    """Prompt + target with the reference's exact join
    (preprocess_data_supervised.py:133: texts + '\\n {output} \\n\\n')."""
    return format_prompt(instruction, input_text) + "\n {} \n\n".format(output)
