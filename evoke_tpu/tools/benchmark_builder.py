"""Multi-view benchmark construction.

Capability parity: EVOKE modules/building_benchmark.py — construct Multi-view
CXR / Two-view CXR annotations: group images by study, keep studies with >= 2
views and non-empty core findings, merge view-position metadata, and emit
either the anchor/auxiliary layout (one item per study, `create_multiview_cxr`)
or the many-to-many layout (one item per view, each view an anchor with the
others auxiliary, `create_multiview_cxr_multi_to_multi`).
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional


def build_multiview_annotation(
    ann: Dict[str, List[dict]],
    view_positions: Optional[Dict[str, str]] = None,
    min_views: int = 2,
    many_to_many: bool = False,
    require_core_findings: bool = True,
) -> Dict[str, List[dict]]:
    """Filter/reshape an annotation into a multi-view benchmark.

    ann items follow the base schema (id, subject_id, study_id, report,
    core_findings, image_path list, ...). view_positions maps image path (or
    dicom id) -> ViewPosition string.
    """
    out: Dict[str, List[dict]] = {}
    for split, items in ann.items():
        new_items: List[dict] = []
        for item in items:
            if require_core_findings and not item.get("core_findings"):
                continue
            paths = list(item.get("image_path") or [])
            paths += list(item.get("multiview_image_path") or [])
            # dedup, preserve order
            seen = set()
            views = [p for p in paths if not (p in seen or seen.add(p))]
            if len(views) < min_views:
                continue
            vps = [view_positions.get(p, "") if view_positions else "" for p in views]
            if many_to_many:
                for i, anchor in enumerate(views):
                    aux = views[:i] + views[i + 1:]
                    new_items.append({
                        **{k: v for k, v in item.items()
                           if k not in ("image_path", "multiview_image_path")},
                        "id": f"{item['id']}_v{i}",
                        "image_path": [anchor],
                        "multiview_image_path": aux,
                        "view_position": [vps[i]] + [vps[j] for j in range(len(views))
                                                     if j != i],
                    })
            else:
                new_items.append({
                    **{k: v for k, v in item.items()
                       if k not in ("image_path", "multiview_image_path")},
                    "image_path": [views[0]],
                    "multiview_image_path": views[1:],
                    "view_position": vps,
                })
        out[split] = new_items
    return out


def build_and_save(ann_path: str, out_path: str, **kwargs) -> str:
    with open(ann_path) as f:
        ann = json.load(f)
    out = build_multiview_annotation(ann, **kwargs)
    with open(out_path, "w") as f:
        json.dump(out, f)
    return out_path
