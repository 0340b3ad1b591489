"""Fluent TopologyBuilder facade — API parity with the reference's
declarative topology DSL (sparkstreaming/App.java:33-53,
kstreams/App.java:35-58, akkastreams/App.java:41-59):

    TopologyBuilder.start("SparkStructuredStreaming", "wordcount-app")
        .with_topic("wordcount-input").end_node()
        .with_node("groupby", "GROUPBY").with_description("Group by word")
            .with_representation("TABLE").with_parent("wordcount-input")
            .end_node()
        .build()

Produces the same dict/JSON shape as plans.topology.topology_of, so a
declared topology and a plan-derived one are interchangeable downstream
(same `__topology`-style payload). The derived path remains the
recommended one — the reference's akka module proves declared DAGs drift
from reality (declares groupby/count it never executes,
akkastreams/App.java:45-54 vs :84-91); the facade exists for users
migrating code written against the reference API.
"""

from __future__ import annotations

import json
from typing import Any

from .topology import TopologyNode


class _NodeBuilder:
    def __init__(self, parent: "TopologyBuilder", name: str, node_type: str):
        self._b = parent
        self._name = name
        self._type = node_type
        self._description = ""
        self._representation = "TABLE"
        self._parents: list[str] = []

    def with_description(self, description: str) -> "_NodeBuilder":
        self._description = description
        return self

    def with_representation(self, representation: str) -> "_NodeBuilder":
        self._representation = representation
        return self

    def with_parent(self, *parent_names: str) -> "_NodeBuilder":
        self._parents.extend(parent_names)
        return self

    def end_node(self) -> "TopologyBuilder":
        self._b._add(
            self._name,
            self._type,
            self._description,
            self._representation,
            self._parents,
        )
        return self._b


class TopologyBuilder:
    """start(app_type, app_name) ... build() — reference-shaped fluent
    DSL over the same TopologyNode model the derived exporter uses."""

    def __init__(self, app_type: str, app_name: str):
        self._app_type = app_type
        self._app_name = app_name
        self._nodes: list[TopologyNode] = []
        self._by_name: dict[str, int] = {}

    @classmethod
    def start(cls, app_type: str, app_name: str) -> "TopologyBuilder":
        return cls(app_type, app_name)

    def with_topic(self, name: str) -> _NodeBuilder:
        return _NodeBuilder(self, name, "TOPIC")

    def with_node(self, name: str, node_type: str) -> _NodeBuilder:
        return _NodeBuilder(self, name, node_type)

    def _add(
        self,
        name: str,
        node_type: str,
        description: str,
        representation: str,
        parent_names: list[str],
    ) -> None:
        if name in self._by_name:
            raise ValueError(f"duplicate node name: {name}")
        missing = [p for p in parent_names if p not in self._by_name]
        if missing:
            raise ValueError(f"unknown parent(s) {missing} for node {name}")
        node_id = len(self._nodes)
        self._nodes.append(
            TopologyNode(
                node_id=node_id,
                name=name,
                node_type=node_type,
                description=description,
                representation=representation,
                parents=[self._by_name[p] for p in parent_names],
            )
        )
        self._by_name[name] = node_id

    def build(self) -> dict[str, Any]:
        return {
            "appName": self._app_name,
            "appType": self._app_type,
            "nodes": [n.to_dict() for n in self._nodes],
        }

    def build_json(self) -> str:
        return json.dumps(self.build(), indent=None, sort_keys=True)


def microservice_topology(
    app_name: str,
    consumes: list[str],
    produces: list[str],
    app_type: str = "Microservice",
) -> dict[str, Any]:
    """MicroserviceTopology.create-style inference (PaymentsService.java:
    74-86, SuspiciousPaymentsService.java:58-61): build the app's DAG
    from its live consumer/producer topic lists — input topics feed an
    app node that feeds output topics. Consume-only services (empty
    `produces`) mirror MicroserviceTopology.fromConsumer."""
    b = TopologyBuilder.start(app_type, app_name)
    for t in consumes:
        b.with_topic(t).end_node()
    nb = b.with_node(app_name, "SELECT").with_description(
        f"{app_name} processing node"
    )
    for t in consumes:
        nb = nb.with_parent(t)
    b = nb.end_node()
    for t in produces:
        b.with_topic(t).with_parent(app_name).end_node()
    return b.build()
