"""Prompt bank loading (the reference's ``models/prompts/*.json`` schema).

Schema (``/root/reference/main_moc.py:139-147,168-174``):

    {"0": {"classnames": {"<label>": ["alias 1", ...], ...},
           "templates":  ["a photomicrograph showing CLASSNAME.", ...]}}

``label_map`` orders labels into class indices; templates contain the literal
``CLASSNAME`` placeholder. A bank expands to, per class, the cross product of
aliases × templates.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Mapping, Sequence


@dataclasses.dataclass(frozen=True)
class PromptBank:
    """Ordered per-class alias lists + shared templates."""

    classnames: tuple[tuple[str, ...], ...]  # [C][n_aliases]
    templates: tuple[str, ...]
    labels: tuple[str, ...]  # label string per class index

    @property
    def n_classes(self) -> int:
        return len(self.classnames)

    def texts_for_class(self, c: int) -> list[list[str]]:
        """Per alias, the list of filled templates (ref
        ``zeroshot_utils.py:31-33``)."""
        return [
            [t.replace("CLASSNAME", alias) for t in self.templates]
            for alias in self.classnames[c]
        ]


def load_prompt_bank(path: str, label_map: Mapping[str, int],
                     key: str = "0") -> PromptBank:
    """Load a prompt JSON, ordering classes by ``label_map`` index
    (ref ``main_moc.py:141-147``)."""
    with open(path) as f:
        bank = json.load(f)[key]
    idx_to_label = {v: k for k, v in label_map.items()}
    labels = tuple(idx_to_label[i] for i in range(len(idx_to_label)))
    classnames = tuple(tuple(bank["classnames"][lab]) for lab in labels)
    return PromptBank(classnames=classnames, templates=tuple(bank["templates"]),
                      labels=labels)


def make_prompt_bank(classnames: Mapping[str, Sequence[str]],
                     templates: Sequence[str],
                     label_map: Mapping[str, int]) -> PromptBank:
    idx_to_label = {v: k for k, v in label_map.items()}
    labels = tuple(idx_to_label[i] for i in range(len(idx_to_label)))
    return PromptBank(
        classnames=tuple(tuple(classnames[lab]) for lab in labels),
        templates=tuple(templates),
        labels=labels,
    )


def save_prompt_bank(path: str, bank: PromptBank, key: str = "0") -> None:
    payload = {
        key: {
            "classnames": {lab: list(names) for lab, names in zip(bank.labels, bank.classnames)},
            "templates": list(bank.templates),
        }
    }
    with open(path, "w") as f:
        json.dump(payload, f, indent=2)
