// Exact lexicographic cut-search solver (native core).
//
// C++ implementation of the branch-and-bound search in
// hardwareawareoptimalquantumcircuitcuttingandknitting_tpu/cutter/solver.py
// (which replicates the reference z3 Optimize model,
// src/HwAwareCutter/Cutter.py:292-571).  The Python solver is the
// readable reference; this file is the hot path — the reference's z3
// MaxSMT search takes minutes on 20-25 qubit circuits (SURVEY §6), this
// search takes milliseconds-to-seconds on the same instances.
//
// Build: make -C native   (produces ../hardwareaware.../_native/libcutsolver.so)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kWire = 0;
constexpr int kGate = 1;
constexpr int kGateUncuttable = 2;

struct Edge {
  int u, v, kind;
};

struct LexKey {
  // (soft_violated, Q, S, A, L, C)
  long long k[6];
  bool operator<(const LexKey& o) const {
    for (int i = 0; i < 6; i++) {
      if (k[i] != o.k[i]) return k[i] < o.k[i];
    }
    return false;
  }
};

struct Solution {
  LexKey key;
  std::vector<int> assignment;
  std::vector<Edge> cuts;
  unsigned tele_mask;
  long long s, a, l, q, c;
  std::vector<long long> q_p, c_p;
  int n_wire, n_gate;
  bool soft_ok;
  bool valid = false;
};

struct Problem {
  int nv;
  std::vector<Edge> edges;
  std::vector<int> initial;
  int P;
  std::vector<long long> caps;
  int force_wire, force_gate, max_cuts, max_qpd, max_cpp;  // -1 == None
  // spare qubit slots beyond the circuit width (sum(caps) - num_qubits);
  // every wire cut consumes one for its vmove qubit.  -1 == unconstrained.
  int spare;
};

class Solver {
 public:
  explicit Solver(const Problem& p) : p_(p) {
    adj_prev_.resize(p_.nv);
    for (const auto& e : p_.edges) adj_prev_[e.v].push_back(e);
    rem_wire_.assign(p_.nv + 1, 0);
    rem_gate_.assign(p_.nv + 1, 0);
    for (int v = p_.nv - 1; v >= 0; v--) {
      rem_wire_[v] = rem_wire_[v + 1];
      rem_gate_[v] = rem_gate_[v + 1];
      for (const auto& e : adj_prev_[v]) {
        if (e.kind == kWire) rem_wire_[v]++;
        else if (e.kind == kGate) rem_gate_[v]++;
      }
    }
    cut_bound_ = p_.max_cuts;
    if (cut_bound_ < 0) {
      if (p_.force_wire >= 0 && p_.force_gate >= 0)
        cut_bound_ = p_.force_wire + p_.force_gate;
      else
        cut_bound_ = (int)p_.edges.size();
    }
    is_initial_.assign(p_.nv, 0);
    for (int vi : p_.initial) is_initial_[vi] = 1;
    symmetric_ = true;
    for (int i = 1; i < p_.P; i++)
      if (p_.caps[i] != p_.caps[0]) symmetric_ = false;
    teleports_possible_ =
        !(p_.max_qpd >= 0 && cut_bound_ <= p_.max_qpd);
    assignment_.assign(p_.nv, 0);
    i_count_.assign(p_.P, 0);
    wire_in_.assign(p_.P, 0);
    best_.key = LexKey{{2, INT64_MAX, INT64_MAX, INT64_MAX, INT64_MAX,
                        INT64_MAX}};
  }

  Solution Run() {
    Dfs(0, 0, 0, -1);
    return best_;
  }

  bool limit_exceeded() const { return limit_exceeded_; }

 private:
  void LeafEvaluate(int n_wire, int n_gate) {
    int n_cuts = (int)cut_edges_.size();
    if (p_.spare >= 0 && n_wire > p_.spare) return;
    if (p_.force_wire >= 0 && n_wire != p_.force_wire) return;
    if (p_.force_gate >= 0 && n_gate != p_.force_gate) return;
    if (p_.max_cuts >= 0 && n_cuts > p_.max_cuts) return;

    std::vector<long long> base_q(p_.P, 0);
    for (int vi : p_.initial) base_q[assignment_[vi]]++;

    bool only_zero_mask = (p_.max_qpd >= 0 && n_cuts <= p_.max_qpd);
    // tele_mask enumeration is bounded to 31 cut edges (1u << 32 is UB and
    // silently yields 1 on x86, skipping every teleport assignment); the
    // Python twin would enumerate 2^n_cuts, so flag the leaf and let the
    // binding raise a catchable error instead of quietly diverging.
    // Real configs cap n_cuts far below this.
    if (!only_zero_mask && n_cuts > 31) {
      limit_exceeded_ = true;
      return;
    }
    unsigned mask_end = only_zero_mask ? 1u : (1u << n_cuts);

    for (unsigned mask = 0; mask < mask_end; mask++) {
      int n_tele = __builtin_popcount(mask);
      int n_qpd = n_cuts - n_tele;
      if (p_.max_qpd >= 0) {
        if (n_qpd > p_.max_qpd) continue;
        if (n_tele > 0 && n_qpd != p_.max_qpd) continue;
      }
      std::vector<long long> q_p(base_q), c_p(p_.P, 0);
      long long s_total = 1, anc_total = 0, lat_total = 0;
      long long qpd_max_v1 = -1, tele_min_v0 = p_.nv;
      for (int i = 0; i < n_cuts; i++) {
        const Edge& e = cut_edges_[i];
        bool tele = (mask >> i) & 1u;
        if (e.kind == kWire) q_p[assignment_[e.v]]++;
        if (tele) {
          q_p[assignment_[e.u]]++;
          q_p[assignment_[e.v]]++;
          anc_total += 2;
          lat_total += 10;
          if (e.u < tele_min_v0) tele_min_v0 = e.u;
        } else {
          if (s_total < (1LL << 55))  // clamp: avoid overflow on huge cut sets
            s_total *= (e.kind == kWire) ? 8 : 6;
          if (e.kind == kWire) anc_total += 1;
          c_p[assignment_[e.u]]++;
          c_p[assignment_[e.v]]++;
          if (e.v > qpd_max_v1) qpd_max_v1 = e.v;
        }
      }
      bool ok = true;
      long long big_q = 0, big_c = 0;
      for (int pi = 0; pi < p_.P; pi++) {
        if (q_p[pi] > p_.caps[pi]) { ok = false; break; }
        if (p_.max_cpp >= 0 && c_p[pi] > p_.max_cpp) { ok = false; break; }
        if (q_p[pi] > big_q) big_q = q_p[pi];
        if (c_p[pi] > big_c) big_c = c_p[pi];
      }
      if (!ok) continue;
      long long a_val = anc_total * s_total;
      bool soft_ok = qpd_max_v1 < tele_min_v0;
      LexKey key{{soft_ok ? 0 : 1, big_q, s_total, a_val, lat_total, big_c}};
      if (key < best_.key) {
        best_.key = key;
        best_.assignment = assignment_;
        best_.cuts.assign(cut_edges_.begin(), cut_edges_.end());
        best_.tele_mask = mask;
        best_.s = s_total;
        best_.a = a_val;
        best_.l = lat_total;
        best_.q = big_q;
        best_.c = big_c;
        best_.q_p = q_p;
        best_.c_p = c_p;
        best_.n_wire = n_wire;
        best_.n_gate = n_gate;
        best_.soft_ok = soft_ok;
        best_.valid = true;
      }
    }
  }

  void Dfs(int v, int n_wire, int n_gate, int used_max) {
    if (v == p_.nv) {
      LeafEvaluate(n_wire, n_gate);
      return;
    }
    int limit = symmetric_ ? std::min(p_.P, used_max + 2) : p_.P;
    for (int part = 0; part < limit; part++) {
      int n_w = n_wire, n_g = n_gate;
      int added = 0;
      bool ok = true;
      for (const auto& e : adj_prev_[v]) {
        if (assignment_[e.u] != part) {
          if (e.kind == kGateUncuttable) { ok = false; break; }
          cut_edges_.push_back(e);
          added++;
          if (e.kind == kWire) n_w++;
          else n_g++;
        }
      }
      if (ok && n_w + n_g <= cut_bound_ &&
          !(p_.spare >= 0 && n_w > p_.spare) &&
          !(p_.force_wire >= 0 &&
            (n_w > p_.force_wire ||
             n_w + rem_wire_[v + 1] < p_.force_wire)) &&
          !(p_.force_gate >= 0 &&
            (n_g > p_.force_gate ||
             n_g + rem_gate_[v + 1] < p_.force_gate)) &&
          !(p_.max_qpd >= 0 && !teleports_possible_ &&
            n_w + n_g > p_.max_qpd)) {
        int d_i = is_initial_[v];
        i_count_[part] += d_i;
        // cut wire edges added here all end at v, whose partition is `part`:
        // the Q_p second term charges the target partition (Cutter.py:421-428)
        int wire_added = 0;
        for (int i = (int)cut_edges_.size() - added;
             i < (int)cut_edges_.size(); i++) {
          if (cut_edges_[i].kind == kWire) wire_added++;
        }
        wire_in_[part] += wire_added;
        bool cap_ok = true;
        long long q_lb = 0;
        for (int pi = 0; pi < p_.P; pi++) {
          long long t = i_count_[pi] + wire_in_[pi];
          if (t > p_.caps[pi]) cap_ok = false;
          if (t > q_lb) q_lb = t;
        }
        if (cap_ok) {
          long long s_lb = 1;
          if (!teleports_possible_) {
            s_lb = 1;
            for (int i = 0; i < n_w + n_g; i++) s_lb *= 6;
          }
          LexKey lb{{0, q_lb, s_lb, 0, 0, 0}};
          if (lb < best_.key) {
            assignment_[v] = part;
            Dfs(v + 1, n_w, n_g, part > used_max ? part : used_max);
          }
        }
        i_count_[part] -= d_i;
        wire_in_[part] -= wire_added;
      }
      for (int i = 0; i < added; i++) cut_edges_.pop_back();
    }
  }

  const Problem& p_;
  std::vector<std::vector<Edge>> adj_prev_;
  std::vector<int> rem_wire_, rem_gate_;
  std::vector<int8_t> is_initial_;
  std::vector<int> assignment_;
  std::vector<Edge> cut_edges_;
  std::vector<long long> i_count_, wire_in_;
  int cut_bound_;
  bool symmetric_, teleports_possible_;
  bool limit_exceeded_ = false;
  Solution best_;
};

}  // namespace

extern "C" {

// Returns 1 if a solution was found, 0 if unsat.
int solve_cut(int nv, int num_edges, const int* edges_u, const int* edges_v,
              const int* edges_kind, int num_initial, const int* initial,
              int num_partitions, const long long* caps, int force_wire,
              int force_gate, int max_cuts, int max_qpd, int max_cpp,
              int spare,
              int* out_assignment, int* out_cut_u, int* out_cut_v,
              int* out_cut_kind, int* out_cut_tele, int* out_n_cuts,
              long long* out_metrics,  // S, A, L, Q, C, nWire, nGate, soft
              long long* out_qp, long long* out_cp) {
  Problem p;
  p.nv = nv;
  p.edges.reserve(num_edges);
  for (int i = 0; i < num_edges; i++)
    p.edges.push_back(Edge{edges_u[i], edges_v[i], edges_kind[i]});
  p.initial.assign(initial, initial + num_initial);
  p.P = num_partitions;
  p.caps.assign(caps, caps + num_partitions);
  p.force_wire = force_wire;
  p.force_gate = force_gate;
  p.max_cuts = max_cuts;
  p.max_qpd = max_qpd;
  p.max_cpp = max_cpp;
  p.spare = spare;

  Solver solver(p);
  Solution sol = solver.Run();
  // -2: a leaf accumulated >31 cut edges with teleports enumerable — the
  // 2^n_cuts mask sweep would overflow; the binding raises so callers can
  // tighten the config or fall back to the Python solver
  if (solver.limit_exceeded()) return -2;
  if (!sol.valid) return 0;

  std::memcpy(out_assignment, sol.assignment.data(), sizeof(int) * nv);
  int nc = (int)sol.cuts.size();
  *out_n_cuts = nc;
  for (int i = 0; i < nc; i++) {
    out_cut_u[i] = sol.cuts[i].u;
    out_cut_v[i] = sol.cuts[i].v;
    out_cut_kind[i] = sol.cuts[i].kind;
    out_cut_tele[i] = (sol.tele_mask >> i) & 1u;
  }
  out_metrics[0] = sol.s;
  out_metrics[1] = sol.a;
  out_metrics[2] = sol.l;
  out_metrics[3] = sol.q;
  out_metrics[4] = sol.c;
  out_metrics[5] = sol.n_wire;
  out_metrics[6] = sol.n_gate;
  out_metrics[7] = sol.soft_ok ? 1 : 0;
  for (int i = 0; i < num_partitions; i++) {
    out_qp[i] = sol.q_p[i];
    out_cp[i] = sol.c_p[i];
  }
  return 1;
}

}  // extern "C"
