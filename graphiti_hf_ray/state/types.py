"""Custom entity/edge type registry (SURVEY.md §1.5 / §2.10).

The reference's user-extension surface: custom entity/edge types are
Pydantic models passed into the pipeline (graphiti_core/graphiti.py:394-398,
validated in utils/ontology_utils/entity_types_utils.py), plus an
``edge_type_map: {(src_label, tgt_label): [edge_type]}`` constraining which
typed edges are legal between which labels (graphiti.py:398, 492-497;
HF CustomTypeManager graphiti_hf/models/custom_types.py:25-207 with
built-ins at 212-375).

The rebuild is dependency-light: a type is a name + field spec dict +
optional validator functions (the reference's eval-string rules,
validator.py:161-245, become plain callables). The registry drives:
- extraction: relation signatures → slot labels (extract/triples.py);
- validation: per-type attribute checks inside map_batches;
- edge legality: ``check_edge_legal`` used by the edge build / audits.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable


@dataclass
class EntityType:
    name: str
    fields: dict[str, type] = field(default_factory=dict)
    validators: dict[str, Callable[[Any], bool]] = field(default_factory=dict)

    def validate(self, attributes: dict[str, Any]) -> list[str]:
        errors = []
        for fname, ftype in self.fields.items():
            if fname in attributes and not isinstance(attributes[fname], ftype):
                errors.append(f"{self.name}.{fname}: expected {ftype.__name__}")
        for fname, fn in self.validators.items():
            if fname in attributes and not fn(attributes[fname]):
                errors.append(f"{self.name}.{fname}: validator failed")
        return errors


@dataclass
class EdgeType:
    name: str  # SCREAMING_SNAKE_CASE predicate
    fields: dict[str, type] = field(default_factory=dict)

    def validate(self, attributes: dict[str, Any]) -> list[str]:
        return [
            f"{self.name}.{f}: expected {t.__name__}"
            for f, t in self.fields.items()
            if f in attributes and not isinstance(attributes[f], t)
        ]


class TypeRegistry:
    """Runtime registry (CustomTypeManager parity, custom_types.py:25-207)."""

    def __init__(self):
        self.entity_types: dict[str, EntityType] = {}
        self.edge_types: dict[str, EdgeType] = {}
        # (src_label, tgt_label) → allowed edge type names (graphiti.py:398)
        self.edge_type_map: dict[tuple[str, str], list[str]] = {}

    def register_entity_type(self, t: EntityType) -> None:
        self.entity_types[t.name] = t

    def register_edge_type(self, t: EdgeType, signatures: list[tuple[str, str]] | None = None) -> None:
        self.edge_types[t.name] = t
        for sig in signatures or []:
            self.edge_type_map.setdefault(sig, []).append(t.name)

    def check_edge_legal(self, src_label: str, tgt_label: str, edge_name: str) -> bool:
        """Signature lookup (edge_operations.py:126-130 equivalent):
        an unmapped signature allows anything (open world); a mapped one
        restricts to its list."""
        allowed = self.edge_type_map.get((src_label, tgt_label))
        return True if allowed is None else edge_name in allowed


def default_registry() -> TypeRegistry:
    """Built-ins mirroring custom_types.py:212-375 (Person/Company/Project/
    Document/Event entities; WorksAt/CollaboratesOn/AuthoredBy/
    ParticipatesIn/RelatedTo edges) plus this engine's grammar predicates."""
    r = TypeRegistry()
    for name, fields in [
        ("Person", {"occupation": str, "location": str}),
        ("Company", {"industry": str, "founded_year": int}),
        ("Organization", {"industry": str}),
        ("Place", {"country": str}),
        ("Project", {"status": str}),
        ("Document", {"title": str}),
        ("Event", {"date": str}),
    ]:
        r.register_entity_type(EntityType(name, fields))
    r.register_edge_type(EdgeType("WORKS_AT", {"role": str}), [("Person", "Organization"), ("Person", "Company")])
    r.register_edge_type(EdgeType("IS_CEO_OF"), [("Person", "Organization"), ("Person", "Company")])
    r.register_edge_type(EdgeType("ACQUIRED", {"price": float}), [("Organization", "Organization")])
    r.register_edge_type(EdgeType("MOVED_TO"), [("Person", "Place")])
    r.register_edge_type(EdgeType("FOUNDED", {"year": int}), [("Person", "Organization")])
    r.register_edge_type(EdgeType("COLLABORATES_ON"), [("Person", "Project")])
    r.register_edge_type(EdgeType("AUTHORED_BY"), [("Document", "Person")])
    r.register_edge_type(EdgeType("PARTICIPATES_IN"), [("Person", "Event")])
    r.register_edge_type(EdgeType("RELATED_TO"))  # open signature
    return r
