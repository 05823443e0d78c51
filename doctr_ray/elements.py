"""Element hierarchy — the durable, JSON-safe document data model.

Re-expressed from the reference's element classes (reference:
io/elements.py — Word :78-118, Artefact :121-149, Line :314-357,
Block :371-421, Page :424-512, Document :600-643), restricted to the
export/round-trip surface: ``export() -> dict`` and ``from_dict``
(io/elements.py:57-72, 115-118). The page image is deliberately not
part of the model (io/elements.py:511-512) — exports are pure
metadata + text, which is what licenses the columnar pipeline.

The builder stage emits exactly ``Page.export()``-shaped dicts
(doctr_ray.builder.BuiltPage.export); these classes wrap them for
users who want the object API and ``render()``.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Word:
    value: str
    confidence: float
    geometry: list[float]            # [xmin, ymin, xmax, ymax] relative
    objectness_score: float = 0.0
    crop_orientation: dict = field(
        default_factory=lambda: {"value": 0, "confidence": None}
    )

    def export(self) -> dict:
        return {
            "value": self.value,
            "confidence": self.confidence,
            "geometry": list(self.geometry),
            "objectness_score": self.objectness_score,
            "crop_orientation": dict(self.crop_orientation),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "Word":
        return cls(
            value=d["value"],
            confidence=d["confidence"],
            geometry=list(d["geometry"]),
            objectness_score=d.get("objectness_score", 0.0),
            crop_orientation=dict(
                d.get("crop_orientation", {"value": 0, "confidence": None})
            ),
        )


@dataclass
class Artefact:
    """Non-textual region (reference io/elements.py:121-149)."""

    artefact_type: str
    confidence: float
    geometry: list[float]

    def export(self) -> dict:
        return {
            "type": self.artefact_type,
            "confidence": self.confidence,
            "geometry": list(self.geometry),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "Artefact":
        return cls(d["type"], d["confidence"], list(d["geometry"]))


@dataclass
class Line:
    words: list[Word]
    geometry: list[float]
    objectness_score: float = 0.0

    def export(self) -> dict:
        return {
            "geometry": list(self.geometry),
            "objectness_score": self.objectness_score,
            "words": [w.export() for w in self.words],
        }

    @classmethod
    def from_dict(cls, d: dict) -> "Line":
        return cls(
            words=[Word.from_dict(w) for w in d["words"]],
            geometry=list(d["geometry"]),
            objectness_score=d.get("objectness_score", 0.0),
        )

    def render(self, word_sep: str = " ") -> str:
        return word_sep.join(w.value for w in self.words)


@dataclass
class Block:
    lines: list[Line]
    geometry: list[float]
    objectness_score: float = 0.0
    artefacts: list[Artefact] = field(default_factory=list)

    def export(self) -> dict:
        return {
            "geometry": list(self.geometry),
            "objectness_score": self.objectness_score,
            "lines": [l.export() for l in self.lines],
            "artefacts": [a.export() for a in self.artefacts],
        }

    @classmethod
    def from_dict(cls, d: dict) -> "Block":
        return cls(
            lines=[Line.from_dict(l) for l in d["lines"]],
            geometry=list(d["geometry"]),
            objectness_score=d.get("objectness_score", 0.0),
            artefacts=[Artefact.from_dict(a) for a in d.get("artefacts", [])],
        )

    def render(self, line_sep: str = "\n") -> str:
        return line_sep.join(l.render() for l in self.lines)


@dataclass
class Page:
    blocks: list[Block]
    page_idx: int = 0
    dimensions: tuple[int, int] = (0, 0)   # (height, width)
    orientation: dict = field(default_factory=lambda: {"value": 0, "confidence": None})
    language: dict = field(default_factory=lambda: {"value": None, "confidence": None})
    # layout regions and recognized tables pass through as raw export
    # dicts (reference io/elements.py:463-512 exports both keys, [] when
    # absent) so a reference Page.export() round-trips losslessly
    layout: list[dict] = field(default_factory=list)
    tables: list[dict] = field(default_factory=list)

    def export(self) -> dict:
        return {
            "page_idx": self.page_idx,
            "dimensions": list(self.dimensions),
            "orientation": dict(self.orientation),
            "language": dict(self.language),
            "blocks": [b.export() for b in self.blocks],
            "layout": [dict(r) for r in self.layout],
            "tables": [dict(t) for t in self.tables],
        }

    @classmethod
    def from_dict(cls, d: dict) -> "Page":
        return cls(
            blocks=[Block.from_dict(b) for b in d["blocks"]],
            page_idx=d.get("page_idx", 0),
            dimensions=tuple(d.get("dimensions", (0, 0))),
            orientation=d.get("orientation", {"value": 0, "confidence": None}),
            language=d.get("language", {"value": None, "confidence": None}),
            layout=list(d.get("layout") or []),
            tables=list(d.get("tables") or []),
        )

    def render(self, block_sep: str = "\n\n") -> str:
        return block_sep.join(b.render() for b in self.blocks)


@dataclass
class Document:
    pages: list[Page]

    def export(self) -> dict:
        return {"pages": [p.export() for p in self.pages]}

    @classmethod
    def from_dict(cls, d: dict) -> "Document":
        return cls(pages=[Page.from_dict(p) for p in d["pages"]])

    def render(self, page_sep: str = "\n\n\n\n") -> str:
        return page_sep.join(p.render() for p in self.pages)
