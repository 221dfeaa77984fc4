// fgpack: native data-pipeline kernels for the factor-graph compiler.
//
// The TPU compute path is JAX/XLA; this is the native runtime around it -
// the host-side hot loops of the input pipeline (DIMACS text parsing and
// ELL adjacency-table construction) that feed the chip. Plain C ABI,
// loaded via ctypes (pdp_solver_tpu/fg/native.py); the Python
// implementations remain as fallback.
//
// Build: make -C native   (produces native/libfgpack.so)

#include <cstdint>
#include <cstdlib>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------------------
// DIMACS parsing.
//
// Two-pass over an in-memory buffer:
//   pass 1 (dimacs_count): number of clauses and literals
//   pass 2 (dimacs_parse): fill edge_var (0-based), edge_clause, edge_sign
// Comment lines ('c ...'), the problem line ('p cnf n m'), '%' terminators
// and blank lines are skipped; clauses are terminated by 0.
// ---------------------------------------------------------------------------

static inline const char* skip_ws(const char* p, const char* end) {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\r' || *p == '\n'))
        ++p;
    return p;
}

static inline const char* skip_line(const char* p, const char* end) {
    while (p < end && *p != '\n') ++p;
    return p < end ? p + 1 : end;
}

// returns 0 on success
int dimacs_count(const char* buf, int64_t len,
                 int64_t* out_num_vars, int64_t* out_num_clauses,
                 int64_t* out_num_lits) {
    const char* p = buf;
    const char* end = buf + len;
    int64_t n = 0, clauses = 0, lits = 0;
    int in_clause = 0;

    while (p < end) {
        p = skip_ws(p, end);
        if (p >= end) break;
        if (*p == 'c') { p = skip_line(p, end); continue; }
        if (*p == '%') { p = skip_line(p, end); continue; }
        if (*p == 'p') {
            // p cnf <n> <m>
            p = skip_ws(p + 1, end);
            while (p < end && *p != ' ' && *p != '\t') ++p;  // skip "cnf"
            n = strtoll(p, const_cast<char**>(&p), 10);
            strtoll(p, const_cast<char**>(&p), 10);  // declared clause count
            p = skip_line(p, end);
            continue;
        }
        char* next;
        long long lit = strtoll(p, &next, 10);
        if (next == p) { p = skip_line(p, end); continue; }
        p = next;
        if (lit == 0) {
            if (in_clause) { ++clauses; in_clause = 0; }
        } else {
            ++lits;
            in_clause = 1;
            long long v = lit < 0 ? -lit : lit;
            if (v > n) n = v;
        }
    }
    if (in_clause) ++clauses;  // unterminated final clause
    *out_num_vars = n;
    *out_num_clauses = clauses;
    *out_num_lits = lits;
    return 0;
}

int dimacs_parse(const char* buf, int64_t len,
                 int32_t* edge_var, int32_t* edge_clause, float* edge_sign,
                 int64_t capacity) {
    const char* p = buf;
    const char* end = buf + len;
    int64_t e = 0;
    int32_t clause = 0;
    int in_clause = 0;

    while (p < end) {
        p = skip_ws(p, end);
        if (p >= end) break;
        if (*p == 'c' || *p == '%') { p = skip_line(p, end); continue; }
        if (*p == 'p') { p = skip_line(p, end); continue; }
        char* next;
        long long lit = strtoll(p, &next, 10);
        if (next == p) { p = skip_line(p, end); continue; }
        p = next;
        if (lit == 0) {
            if (in_clause) { ++clause; in_clause = 0; }
        } else {
            if (e >= capacity) return -1;
            edge_var[e] = (int32_t)((lit < 0 ? -lit : lit) - 1);
            edge_clause[e] = clause;
            edge_sign[e] = lit < 0 ? -1.0f : 1.0f;
            ++e;
            in_clause = 1;
        }
    }
    return (int)e < 0 ? -1 : 0;
}

// ---------------------------------------------------------------------------
// ELL adjacency-table construction: edge ids per node at fixed width,
// -1 padded. Returns the max degree (so the caller can decide on fallback),
// or -1 if max degree exceeds `width` (table left partially filled).
// ---------------------------------------------------------------------------

int64_t build_ell(const int32_t* node_ids, int64_t num_edges,
                  int32_t* table, int64_t num_nodes, int64_t width,
                  int32_t* scratch_counts /* size num_nodes, zeroed */) {
    memset(scratch_counts, 0, num_nodes * sizeof(int32_t));
    for (int64_t i = 0; i < num_nodes * width; ++i) table[i] = -1;

    int64_t max_deg = 0;
    for (int64_t e = 0; e < num_edges; ++e) {
        int32_t nid = node_ids[e];
        int32_t slot = scratch_counts[nid]++;
        if (slot >= width) return -1;
        table[(int64_t)nid * width + slot] = (int32_t)e;
        if (slot + 1 > max_deg) max_deg = slot + 1;
    }
    return max_deg;
}

int64_t max_degree(const int32_t* node_ids, int64_t num_edges,
                   int64_t num_nodes,
                   int32_t* scratch_counts /* size num_nodes */) {
    memset(scratch_counts, 0, num_nodes * sizeof(int32_t));
    int64_t m = 0;
    for (int64_t e = 0; e < num_edges; ++e) {
        int32_t c = ++scratch_counts[node_ids[e]];
        if (c > m) m = c;
    }
    return m;
}

}  // extern "C"
