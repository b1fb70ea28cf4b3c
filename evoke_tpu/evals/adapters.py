"""Host-side adapters for heavy external CE metrics (off the training hot path).

Capability parity (SURVEY §2.6/§2.12): F1-RadGraph (AllenNLP/DyGIE), GREEN
(LLM judge), RadEntity NLI/exact (stanza + BERT-NLI), BERTScore. None of these
stacks is portable to TPU and none of their pip packages is baked into this
image, so each adapter (a) uses the package when installed, (b) caches results
keyed by text-pair hash (the reference re-instantiates scorers every epoch —
metrics.py:59-70 — which we explicitly avoid), and (c) degrades loudly (raises
MetricUnavailable with install guidance), never silently returning zeros.

BERTScore is the exception: implemented natively below (greedy cosine matching
over BERT token embeddings) using torch-transformers at the eval edge.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Dict, List, Optional, Sequence, Tuple


class MetricUnavailable(RuntimeError):
    pass


class _DiskCache:
    def __init__(self, path: Optional[str]):
        self.path = path
        self._mem: Dict[str, object] = {}
        if path and os.path.exists(path):
            with open(path) as f:
                self._mem = json.load(f)

    @staticmethod
    def key(*texts: str) -> str:
        h = hashlib.sha256()
        for t in texts:
            h.update(t.encode())
            h.update(b"\x00")
        return h.hexdigest()

    def get(self, key):
        return self._mem.get(key)

    def put(self, key, value):
        self._mem[key] = value
        if self.path:
            with open(self.path, "w") as f:
                json.dump(self._mem, f)


class F1RadGraphAdapter:
    """Wraps the `radgraph` pip package (F1RadGraph) with pair-level caching."""

    def __init__(self, model_path: str, reward_level: str = "partial",
                 cache_path: Optional[str] = None):
        try:
            from radgraph import F1RadGraph  # type: ignore
        except ImportError as e:
            raise MetricUnavailable(
                "F1-RadGraph needs the `radgraph` package (AllenNLP/DyGIE stack); "
                "install it on the eval host or configure a scoring service."
            ) from e
        self.scorer = F1RadGraph(reward_level=reward_level, model_path=model_path)
        self.cache = _DiskCache(cache_path)

    def __call__(self, hyps: Sequence[str], refs: Sequence[str]) -> Tuple[float, List[float]]:
        rewards: List[Optional[float]] = []
        todo_h, todo_r, todo_i = [], [], []
        for i, (h, r) in enumerate(zip(hyps, refs)):
            c = self.cache.get(self.cache.key(h, r))
            rewards.append(c)
            if c is None:
                todo_h.append(h)
                todo_r.append(r)
                todo_i.append(i)
        if todo_h:
            _, reward_list, _, _ = self.scorer(hyps=todo_h, refs=todo_r)
            for i, rw in zip(todo_i, reward_list):
                rewards[i] = float(rw)
                self.cache.put(self.cache.key(hyps[i], refs[i]), float(rw))
        vals = [float(r) for r in rewards]
        return sum(vals) / max(len(vals), 1), vals


def radgraph_serialize(reports: List[str], model_path: Optional[str] = None
                       ) -> List[List[str]]:
    """RadGraph NER -> core_findings keyword lists (factual serialization NER hook)."""
    try:
        from radgraph import RadGraph  # type: ignore
    except ImportError as e:
        raise MetricUnavailable("radgraph package not installed") from e
    rg = RadGraph(model_path=model_path) if model_path else RadGraph()
    annotations = rg(reports)
    out: List[List[str]] = []
    for i in range(len(reports)):
        ann = annotations.get(str(i), {}) if isinstance(annotations, dict) else {}
        ents = ann.get("entities", {})
        toks = [e.get("tokens", "") for e in ents.values()
                if "ANAT" in e.get("label", "") or "OBS" in e.get("label", "")]
        out.append([t for t in toks if t])
    return out


class GreenAdapter:
    """GREEN LLM-judge (StanfordAIMI/GREEN-radllama2-7b) via transformers.

    The reference shells a 7B fp16 causal LM per (ref, pred) pair
    (green_score/green.py:25-222). Here generation is batched through the HF
    pipeline on the eval host; gated on the checkpoint being present locally
    (zero-egress images cannot download it).
    """

    def __init__(self, model_path: str, batch_size: int = 8, max_new_tokens: int = 256):
        if not os.path.isdir(model_path):
            raise MetricUnavailable(f"GREEN model not found at {model_path}")
        from transformers import AutoModelForCausalLM, AutoTokenizer  # noqa

        self.tokenizer = AutoTokenizer.from_pretrained(model_path)
        self.model = AutoModelForCausalLM.from_pretrained(model_path)
        self.batch_size = batch_size
        self.max_new_tokens = max_new_tokens

    @staticmethod
    def make_prompt(ref: str, hyp: str) -> str:
        """The GREEN judging prompt (green_score/utils.py:189 contract): six error
        categories (a)-(f), significant/insignificant sections, matched findings."""
        return (
            "Objective: Evaluate the accuracy of a candidate radiology report in "
            "comparison to a reference radiology report composed by expert "
            "radiologists.\n\n    Process Overview: You will be presented with:\n\n"
            "    1. The criteria for making a judgment.\n"
            "    2. The reference radiology report.\n"
            "    3. The candidate radiology report.\n"
            "    4. The desired format for your assessment.\n\n"
            "    1. Criteria for Judgment:\n\n    For each candidate report, determine:\n\n"
            "    The count of clinically significant errors.\n"
            "    The count of clinically insignificant errors.\n\n"
            "    Errors can fall into one of these categories:\n\n"
            "    a) False report of a finding in the candidate.\n"
            "    b) Missing a finding present in the reference.\n"
            "    c) Misidentification of a finding's anatomic location/position.\n"
            "    d) Misassessment of the severity of a finding.\n"
            "    e) Mentioning a comparison that isn't in the reference.\n"
            "    f) Omitting a comparison detailing a change from a prior study.\n"
            "    Note: Concentrate on the clinical findings rather than the report's "
            "writing style. Evaluate only the findings that appear in both reports.\n\n"
            f"    2. Reference Report:\n    {ref}\n\n"
            f"    3. Candidate Report:\n    {hyp}\n\n"
            "    4. Reporting Your Assessment:\n\n"
            "    Follow this specific format for your output, even if no errors are "
            "found:\n    ```\n    [Explanation]:\n    <Explanation>\n\n"
            "    [Clinically Significant Errors]:\n"
            "    (a) <Error Type>: <The number of errors>. <Error 1>; <Error 2>; ...; "
            "<Error n>\n    ....\n"
            "    (f) <Error Type>: <The number of errors>. <Error 1>; <Error 2>; ...; "
            "<Error n>\n\n    [Clinically Insignificant Errors]:\n"
            "    (a) <Error Type>: <The number of errors>. <Error 1>; <Error 2>; ...; "
            "<Error n>\n    ....\n"
            "    (f) <Error Type>: <The number of errors>. <Error 1>; <Error 2>; ...; "
            "<Error n>\n\n    [Matched Findings]:\n"
            "    <The number of matched findings>. <Finding 1>; <Finding 2>; ...; "
            "<Finding n>\n    ```\n")

    def __call__(self, hyps: Sequence[str], refs: Sequence[str]) -> float:
        import torch

        scores = []
        for h, r in zip(hyps, refs):
            prompt = self.make_prompt(r, h)
            ids = self.tokenizer(prompt, return_tensors="pt")
            with torch.no_grad():
                out = self.model.generate(**ids, max_new_tokens=self.max_new_tokens)
            text = self.tokenizer.decode(out[0], skip_special_tokens=True)
            scores.append(self.parse_green(text))
        return sum(scores) / max(len(scores), 1)

    @staticmethod
    def parse_green(response: str) -> float:
        """Parse matched findings / clinically SIGNIFICANT errors into the GREEN
        score (green_score/green.py:216-260: green = m / (m + sum(sig_errors));
        insignificant errors do not count against the score)."""
        import re

        m = re.search(r"Matched Findings\]?:\s*(\d+)", response)
        matched = int(m.group(1)) if m else 0
        sig_block = response
        if "Clinically Insignificant Errors" in response:
            sig_block = response.split("Clinically Insignificant Errors")[0]
        errors = [int(x) for x in re.findall(r"\([a-f]\)\s*[^:]*:\s*(\d+)", sig_block)]
        sig = sum(errors)
        if matched + sig == 0:
            return 0.0
        return matched / (matched + sig)


class RadEntityAdapter:
    """RadEntity exact/NLI entity match (stanza radiology NER), gated."""

    def __init__(self):
        try:
            import stanza  # type: ignore # noqa
        except ImportError as e:
            raise MetricUnavailable("RadEntity metrics need the `stanza` package") from e
        import stanza

        self.nlp = stanza.Pipeline("en", package="radiology", processors={"ner": "radiology"})

    def entities(self, text: str) -> List[str]:
        doc = self.nlp(text)
        return [ent.text.lower() for ent in doc.entities]

    def exact_match_f1(self, hyps: Sequence[str], refs: Sequence[str]) -> float:
        f1s = []
        for h, r in zip(hyps, refs):
            he, re_ = set(self.entities(h)), set(self.entities(r))
            if not he and not re_:
                f1s.append(1.0)
                continue
            inter = len(he & re_)
            p = inter / max(len(he), 1)
            q = inter / max(len(re_), 1)
            f1s.append(0.0 if p + q == 0 else 2 * p * q / (p + q))
        return sum(f1s) / max(len(f1s), 1)


class NLIScorer:
    """Sentence-level NLI scoring for the RadEntityNLI metric
    (EVOKE modules/metrics/RadEntityNLI/nli.py contract): an HF
    sequence-classification NLI model scores hypothesis sentences against
    reference sentences; an entity match is NLI-weighted by the best
    entailment probability of its containing sentence. Gated on a local
    checkpoint (e.g. a BERT-NLI fine-tune with entailment as class index 0/2
    per its config.id2label)."""

    def __init__(self, model_path: str, batch_size: int = 32):
        if not os.path.isdir(model_path):
            raise MetricUnavailable(f"NLI model not found at {model_path}")
        from transformers import (AutoModelForSequenceClassification,  # noqa
                                  AutoTokenizer)

        self.tokenizer = AutoTokenizer.from_pretrained(model_path)
        self.model = AutoModelForSequenceClassification.from_pretrained(model_path)
        self.model.eval()
        id2label = getattr(self.model.config, "id2label", {}) or {}
        self.entail_idx = next(
            (int(i) for i, lbl in id2label.items()
             if "entail" in str(lbl).lower()), 0)
        self.batch_size = batch_size

    def entailment_probs(self, premises: Sequence[str], hypotheses: Sequence[str]
                         ) -> List[float]:
        import torch

        out: List[float] = []
        for s in range(0, len(premises), self.batch_size):
            enc = self.tokenizer(list(premises[s:s + self.batch_size]),
                                 list(hypotheses[s:s + self.batch_size]),
                                 return_tensors="pt", padding=True, truncation=True,
                                 max_length=256)
            with torch.no_grad():
                logits = self.model(**enc).logits
            probs = torch.softmax(logits, dim=-1)[:, self.entail_idx]
            out.extend(probs.tolist())
        return out


def bertscore(hyps: Sequence[str], refs: Sequence[str], model_path: str,
              num_layers: int = 5, batch_size: int = 32) -> float:
    """Native BERTScore-F1: greedy cosine matching over layer-`num_layers` BERT
    token embeddings (the bert_score package's core algorithm, no baselines/idf;
    reference modules/bertscore.py used distilbert rescaled — treat as indicative)."""
    if not os.path.isdir(model_path):
        raise MetricUnavailable(f"BERTScore model not found at {model_path}")
    import torch
    from transformers import AutoModel, AutoTokenizer

    tok = AutoTokenizer.from_pretrained(model_path)
    model = AutoModel.from_pretrained(model_path, output_hidden_states=True)
    model.eval()

    def embed(texts):
        enc = tok(list(texts), return_tensors="pt", padding=True, truncation=True,
                  max_length=256)
        with torch.no_grad():
            out = model(**enc)
        h = out.hidden_states[num_layers]
        h = torch.nn.functional.normalize(h, dim=-1)
        return h, enc["attention_mask"].bool()

    f1s = []
    for start in range(0, len(hyps), batch_size):
        hh, rr = hyps[start:start + batch_size], refs[start:start + batch_size]
        eh, mh = embed(hh)
        er, mr = embed(rr)
        for i in range(len(hh)):
            a = eh[i][mh[i]]
            b = er[i][mr[i]]
            sim = a @ b.T
            p = sim.max(dim=1).values.mean().item()
            r = sim.max(dim=0).values.mean().item()
            f1s.append(0.0 if p + r == 0 else 2 * p * r / (p + r))
    return sum(f1s) / max(len(f1s), 1)
