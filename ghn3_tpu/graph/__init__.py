from .primitives import PRIMITIVES, PRIMITIVE_INDEX, NUM_PRIMITIVES
from .graphdef import GraphDef, GraphBatch, NodeParam, bucket_size, balanced_partition
from .shortest_paths import add_virtual_edges, dag_all_pairs_shortest_paths, topological_order

__all__ = ['PRIMITIVES', 'PRIMITIVE_INDEX', 'NUM_PRIMITIVES', 'GraphDef', 'GraphBatch',
           'NodeParam', 'bucket_size', 'balanced_partition', 'add_virtual_edges',
           'dag_all_pairs_shortest_paths', 'topological_order']
