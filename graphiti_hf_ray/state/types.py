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
            if fname in attributes:
                try:
                    ok = fn(attributes[fname])
                except Exception:  # wrong-typed value → validation failure,
                    ok = False  # matching pydantic's raise-as-error behavior
                if not ok:
                    errors.append(f"{self.name}.{fname}: validator failed")
        return errors


@dataclass
class EdgeType:
    name: str  # SCREAMING_SNAKE_CASE predicate
    fields: dict[str, type] = field(default_factory=dict)
    # Functional predicate: at most one ACTIVE subject per object at a time
    # (e.g. a company has one CEO). Drives the bi-temporal contradiction
    # sweep (stages/edges.py, TS2-TS4): a newer edge on the same
    # (group, pred, object) invalidates the older one — the reference's
    # general contradiction resolution (edge_operations.py:381-411), keyed
    # here by a declared type property instead of an LLM judgment.
    functional: bool = False

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

    def functional_predicates(self) -> frozenset[str]:
        """Predicates whose edges the bi-temporal sweep invalidates
        (TS3/TS4 "newer info wins"). Registering a new functional edge type
        here is ALL a user does to get invalidation for it — the sweep in
        stages/edges.py reads this set, nothing is hardcoded there."""
        return frozenset(t.name for t in self.edge_types.values() if t.functional)


def default_registry() -> TypeRegistry:
    """Built-ins mirroring custom_types.py:212-375 (Person/Company/Project/
    Document/Event entities; WorksAt/CollaboratesOn/AuthoredBy/
    ParticipatesIn/RelatedTo edges), including the reference's field-level
    validator rules (age >= 0 :217, founded_year > 1800 :240, employee_count
    >= 0 :246, hours_spent >= 0 :327, strength in [0,1] :369), plus this
    engine's grammar predicates."""
    r = TypeRegistry()
    for name, fields, validators in [
        (
            "Person",
            {"name": str, "age": int, "occupation": str, "location": str, "skills": list},
            {"age": lambda v: v >= 0},
        ),
        (
            "Company",
            {"name": str, "industry": str, "founded_year": int, "headquarters": str, "employee_count": int},
            {"founded_year": lambda v: v >= 1800, "employee_count": lambda v: v >= 0},
        ),
        ("Organization", {"industry": str}, {}),
        ("Place", {"country": str}, {}),
        (
            "Project",
            {"name": str, "description": str, "start_date": str, "end_date": str, "status": str, "tags": list},
            {},
        ),
        (
            "Document",
            {"title": str, "content": str, "author": str, "publication_date": str, "keywords": list},
            {},
        ),
        (
            "Event",
            {"name": str, "date": str, "location": str, "participants": list, "description": str},
            {},
        ),
    ]:
        r.register_entity_type(EntityType(name, fields, validators))
    r.register_edge_type(
        EdgeType("WORKS_AT", {"role": str, "start_date": str, "end_date": str, "department": str}),
        [("Person", "Organization"), ("Person", "Company")],
    )
    r.register_edge_type(
        EdgeType("IS_CEO_OF", functional=True),  # one CEO per company at a time
        [("Person", "Organization"), ("Person", "Company")],
    )
    r.register_edge_type(EdgeType("ACQUIRED", {"price": float}), [("Organization", "Organization")])
    r.register_edge_type(EdgeType("MOVED_TO"), [("Person", "Place")])
    r.register_edge_type(
        EdgeType("FOUNDED", {"year": int}, functional=True),  # corpus semantics: one founder of record
        [("Person", "Organization")],
    )
    r.register_edge_type(
        EdgeType("COLLABORATES_ON", {"role": str, "contribution": str, "hours_spent": int}),
        [("Person", "Project")],
    )
    r.register_edge_type(
        EdgeType("AUTHORED_BY", {"contribution_type": str, "publication_date": str}),
        [("Document", "Person")],
    )
    r.register_edge_type(
        EdgeType("PARTICIPATES_IN", {"role": str, "attendance_status": str}),
        [("Person", "Event")],
    )
    r.register_edge_type(EdgeType("RELATED_TO", {"relationship_type": str, "strength": float}))
    # this engine's remaining grammar predicates (extract/triples.py RELATIONS)
    r.register_edge_type(EdgeType("PARTNERED_WITH"), [("Organization", "Organization")])
    r.register_edge_type(EdgeType("LOCATED_IN"), [("Organization", "Place")])
    return r


BUILTIN_ENTITY_TYPES = (
    "Person", "Company", "Organization", "Place", "Project", "Document", "Event",
)
BUILTIN_EDGE_TYPES = (
    "WORKS_AT", "IS_CEO_OF", "ACQUIRED", "MOVED_TO", "FOUNDED",
    "COLLABORATES_ON", "AUTHORED_BY", "PARTICIPATES_IN", "RELATED_TO",
)
