// Native batch packer — the host-side hot loop of the data pipeline.
//
// The reference's collation (pre_process/data_loader.py:50-88) is a Python
// per-graph numpy loop; at TPU feed rates the interpreter becomes the
// bottleneck. This library fills the padded device-batch buffers in one
// pass over flat graph arrays (the same layout the .npz dataset cache
// stores): packed COO batches (flat node/edge axes, dummy-sink edge
// padding) and dense padded batches.
//
// Built by mpnn_tpu/native/__init__.py with g++ at first use; the Python
// numpy path remains as a fallback and as the parity oracle
// (tests/test_native.py).

#include <cstdint>
#include <cstring>

extern "C" {

// Pack a batch of graphs into the flat packed-COO layout.
//   afm/nafm:           (total_atoms, fa/fn) row-major, graphs concatenated
//   edge_feats/src/dst: (total_edges, fe) / (total_edges,) per-graph-local
//   offsets_a/e:        (n_graphs+1,) prefix offsets into the above
// Outputs must be pre-allocated with the documented capacities; the
// function zero-fills them first. Returns 0 on success, -1 if capacities
// are exceeded.
int pack_batch(const float* afm, const float* nafm, const float* edge_feats,
               const int32_t* edge_src, const int32_t* edge_dst,
               const int64_t* offsets_a, const int64_t* offsets_e,
               int n_graphs, int fa, int fn, int fe,
               int node_cap, int edge_cap, int num_graph_slots,
               float* node_feats, float* node_nafm, float* node_mask,
               int32_t* node_graph, int32_t* out_src, int32_t* out_dst,
               float* out_efeats, float* out_emask, float* graph_mask) {
  const int64_t total_nodes = offsets_a[n_graphs];
  const int64_t total_edges = offsets_e[n_graphs];
  if (total_nodes + 1 > node_cap || total_edges > edge_cap) return -1;
  // graph_mask is (num_graph_slots,): writing graph_mask[g] for
  // g >= num_graph_slots would be an out-of-bounds heap write
  if (n_graphs > num_graph_slots) return -1;

  std::memset(node_feats, 0, sizeof(float) * node_cap * fa);
  std::memset(node_nafm, 0, sizeof(float) * node_cap * fn);
  std::memset(node_mask, 0, sizeof(float) * node_cap);
  std::memset(out_efeats, 0, sizeof(float) * edge_cap * fe);
  std::memset(out_emask, 0, sizeof(float) * edge_cap);
  std::memset(graph_mask, 0, sizeof(float) * num_graph_slots);
  for (int i = 0; i < node_cap; ++i) node_graph[i] = num_graph_slots;
  for (int i = 0; i < edge_cap; ++i) {
    out_src[i] = node_cap - 1;
    out_dst[i] = node_cap - 1;
  }

  std::memcpy(node_feats, afm, sizeof(float) * total_nodes * fa);
  std::memcpy(node_nafm, nafm, sizeof(float) * total_nodes * fn);
  std::memcpy(out_efeats, edge_feats, sizeof(float) * total_edges * fe);
  for (int64_t i = 0; i < total_nodes; ++i) node_mask[i] = 1.0f;
  for (int64_t i = 0; i < total_edges; ++i) out_emask[i] = 1.0f;

  for (int g = 0; g < n_graphs; ++g) {
    const int64_t a0 = offsets_a[g], a1 = offsets_a[g + 1];
    const int64_t e0 = offsets_e[g], e1 = offsets_e[g + 1];
    for (int64_t i = a0; i < a1; ++i) node_graph[i] = g;
    for (int64_t i = e0; i < e1; ++i) {
      out_src[i] = edge_src[i] + static_cast<int32_t>(a0);
      out_dst[i] = edge_dst[i] + static_cast<int32_t>(a0);
    }
    graph_mask[g] = 1.0f;
  }
  return 0;
}

// Dense padded collation: afm (B,N,fa), bfm (B,N,N,fe), adj (B,N,N),
// mask (B,N,1) from the same flat inputs.
int pack_dense(const float* afm, const float* nafm, const float* edge_feats,
               const int32_t* edge_src, const int32_t* edge_dst,
               const int64_t* offsets_a, const int64_t* offsets_e,
               int n_graphs, int fa, int fn, int fe, int n_cap,
               float* out_afm, float* out_nafm, float* out_bfm,
               float* out_adj, float* out_mask) {
  std::memset(out_afm, 0, sizeof(float) * n_graphs * n_cap * fa);
  std::memset(out_nafm, 0, sizeof(float) * n_graphs * n_cap * fn);
  std::memset(out_bfm, 0,
              sizeof(float) * (int64_t)n_graphs * n_cap * n_cap * fe);
  std::memset(out_adj, 0, sizeof(float) * (int64_t)n_graphs * n_cap * n_cap);
  std::memset(out_mask, 0, sizeof(float) * n_graphs * n_cap);

  for (int g = 0; g < n_graphs; ++g) {
    const int64_t a0 = offsets_a[g], a1 = offsets_a[g + 1];
    const int64_t na = a1 - a0;
    if (na > n_cap) return -1;
    for (int64_t i = 0; i < na; ++i) {
      std::memcpy(out_afm + ((int64_t)g * n_cap + i) * fa,
                  afm + (a0 + i) * fa, sizeof(float) * fa);
      std::memcpy(out_nafm + ((int64_t)g * n_cap + i) * fn,
                  nafm + (a0 + i) * fn, sizeof(float) * fn);
      out_mask[(int64_t)g * n_cap + i] = 1.0f;
    }
    const int64_t e0 = offsets_e[g], e1 = offsets_e[g + 1];
    for (int64_t e = e0; e < e1; ++e) {
      const int32_t s = edge_src[e], d = edge_dst[e];
      float* bf = out_bfm +
          (((int64_t)g * n_cap + s) * n_cap + d) * fe;
      std::memcpy(bf, edge_feats + e * fe, sizeof(float) * fe);
      out_adj[((int64_t)g * n_cap + s) * n_cap + d] = 1.0f;
    }
  }
  return 0;
}

// Gather-collate: same packed layout as pack_batch, but graphs are
// SELECTED by index from DATASET-WIDE flat arrays (flattened once per
// run), so the per-batch host cost is pure memcpy — no per-call Python
// flattening (measured ~3 ms/batch of np.concatenate glue at batch
// 1024). evids/etypes are optional per-edge int32 channels (vocab ids /
// GGNN bond types); pass nullptr. Pad edges carry id/type 0 — the
// zero-matrix convention the kernels rely on.
int pack_batch_gather(const float* afm, const float* nafm,
                      const float* edge_feats, const int32_t* edge_src,
                      const int32_t* edge_dst, const int32_t* evids,
                      const int32_t* etypes, const int64_t* offsets_a,
                      const int64_t* offsets_e, const int32_t* sel,
                      int n_sel, int fa, int fn, int fe, int node_cap,
                      int edge_cap, int num_graph_slots,
                      float* node_feats, float* node_nafm,
                      float* node_mask, int32_t* node_graph,
                      int32_t* out_src, int32_t* out_dst,
                      float* out_efeats, float* out_emask,
                      float* graph_mask, int32_t* out_vid,
                      int32_t* out_types) {
  if (n_sel > num_graph_slots) return -1;
  std::memset(node_feats, 0, sizeof(float) * node_cap * fa);
  std::memset(node_nafm, 0, sizeof(float) * node_cap * fn);
  std::memset(node_mask, 0, sizeof(float) * node_cap);
  std::memset(out_efeats, 0, sizeof(float) * edge_cap * fe);
  std::memset(out_emask, 0, sizeof(float) * edge_cap);
  std::memset(graph_mask, 0, sizeof(float) * num_graph_slots);
  if (out_vid) std::memset(out_vid, 0, sizeof(int32_t) * edge_cap);
  if (out_types) std::memset(out_types, 0, sizeof(int32_t) * edge_cap);
  for (int i = 0; i < node_cap; ++i) node_graph[i] = num_graph_slots;
  for (int i = 0; i < edge_cap; ++i) {
    out_src[i] = node_cap - 1;
    out_dst[i] = node_cap - 1;
  }
  int64_t n_off = 0, e_off = 0;
  for (int j = 0; j < n_sel; ++j) {
    const int32_t g = sel[j];
    const int64_t a0 = offsets_a[g], na = offsets_a[g + 1] - a0;
    const int64_t e0 = offsets_e[g], ne = offsets_e[g + 1] - e0;
    // +1 keeps the dummy-sink node slot free (pack_batch convention)
    if (n_off + na + 1 > node_cap || e_off + ne > edge_cap) return -1;
    std::memcpy(node_feats + n_off * fa, afm + a0 * fa,
                sizeof(float) * na * fa);
    std::memcpy(node_nafm + n_off * fn, nafm + a0 * fn,
                sizeof(float) * na * fn);
    for (int64_t i = 0; i < na; ++i) {
      node_mask[n_off + i] = 1.0f;
      node_graph[n_off + i] = j;
    }
    std::memcpy(out_efeats + e_off * fe, edge_feats + e0 * fe,
                sizeof(float) * ne * fe);
    for (int64_t i = 0; i < ne; ++i) {
      out_src[e_off + i] = edge_src[e0 + i] + static_cast<int32_t>(n_off);
      out_dst[e_off + i] = edge_dst[e0 + i] + static_cast<int32_t>(n_off);
      out_emask[e_off + i] = 1.0f;
    }
    if (out_vid && evids)
      std::memcpy(out_vid + e_off, evids + e0, sizeof(int32_t) * ne);
    if (out_types && etypes)
      std::memcpy(out_types + e_off, etypes + e0, sizeof(int32_t) * ne);
    graph_mask[j] = 1.0f;
    n_off += na;
    e_off += ne;
  }
  return 0;
}

}  // extern "C"
