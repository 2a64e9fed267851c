// mechc — chemistry-mechanism compiler (the KPP analog).
//
// The reference generates mechanism-specific Fortran solvers with KPP, a
// C lex/yacc code generator (canonical: chem/KPP/, ~15k LoC of C;
// SURVEY.md §2.6-3). This framework's solver is generic and data-driven,
// so the native tool's job is smaller but plays the same role: parse a
// KPP-style mechanism description (.eqn) into the validated stoichiometry
// /rate tables the batched Rosenbrock solver consumes.
//
//   mechc input.eqn > mechanism.json
//
// Grammar (one statement per ';'; '!' or '//' start comments):
//
//   #SPECIES a b c ...            declare species (order = state layout)
//   lhs = rhs : RATE ;            reaction
//     lhs:  sp [+ sp ...]         up to 3 reactants
//     rhs:  [coef] sp [+ ...]     stoichiometric products; empty = pure loss
//     RATE: ARR(A, n, E_R)        k = A (T/300)^n exp(-E_R/T)
//           PHOT(name, scale)     k = scale * J_name
//
// Emits JSON: {"species": [...], "reactions": [{"reactants": [...],
// "products": [[sp, coef], ...], "rate": ["arr"|"phot", ...]}, ...]}.
// Exits non-zero with a message on any undeclared species, malformed
// statement, or empty mechanism — the compile-time validation KPP does.

#include <cctype>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <iostream>
#include <map>
#include <sstream>
#include <string>
#include <vector>

namespace {

struct Product { std::string sp; double coef; };
struct Rate { std::string kind; std::string phot; double a = 0, n = 0, e_r = 0, scale = 1; };
struct Reaction {
  std::vector<std::string> reactants;
  std::vector<Product> products;
  Rate rate;
};

[[noreturn]] void die(const std::string& msg, int line = -1) {
  if (line >= 0) std::cerr << "mechc: line " << line << ": " << msg << "\n";
  else std::cerr << "mechc: " << msg << "\n";
  std::exit(1);
}

std::string strip(const std::string& s) {
  size_t a = s.find_first_not_of(" \t\r\n");
  if (a == std::string::npos) return "";
  size_t b = s.find_last_not_of(" \t\r\n");
  return s.substr(a, b - a + 1);
}

std::string lower(std::string s) {
  for (char& c : s) c = char(std::tolower(static_cast<unsigned char>(c)));
  return s;
}

std::vector<std::string> split(const std::string& s, char sep) {
  std::vector<std::string> out;
  std::stringstream ss(s);
  std::string tok;
  while (std::getline(ss, tok, sep)) out.push_back(tok);
  return out;
}

Rate parse_rate(const std::string& txt, int line) {
  std::string t = strip(txt);
  size_t lp = t.find('(');
  size_t rp = t.rfind(')');
  if (lp == std::string::npos || rp == std::string::npos || rp < lp)
    die("malformed rate '" + t + "'", line);
  std::string fn = lower(strip(t.substr(0, lp)));
  std::vector<std::string> args = split(t.substr(lp + 1, rp - lp - 1), ',');
  Rate r;
  if (fn == "arr") {
    if (args.size() != 3) die("ARR needs 3 args", line);
    r.kind = "arr";
    r.a = std::atof(strip(args[0]).c_str());
    r.n = std::atof(strip(args[1]).c_str());
    r.e_r = std::atof(strip(args[2]).c_str());
  } else if (fn == "phot") {
    if (args.empty() || args.size() > 2) die("PHOT needs 1-2 args", line);
    r.kind = "phot";
    r.phot = lower(strip(args[0]));
    r.scale = args.size() == 2 ? std::atof(strip(args[1]).c_str()) : 1.0;
  } else {
    die("unknown rate function '" + fn + "'", line);
  }
  return r;
}

void json_escape(std::ostream& o, const std::string& s) {
  o << '"';
  for (char c : s)
    if (c == '"' || c == '\\') o << '\\' << c;
    else o << c;
  o << '"';
}

// %.17g round-trips doubles exactly through JSON
void json_num(std::ostream& o, double v) {
  char buf[40];
  std::snprintf(buf, sizeof buf, "%.17g", v);
  o << buf;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc != 2) die("usage: mechc input.eqn > mechanism.json");
  std::ifstream in(argv[1]);
  if (!in) die(std::string("cannot open ") + argv[1]);

  std::vector<std::string> species;
  std::map<std::string, int> sp_index;
  std::vector<Reaction> reactions;

  std::string raw, pending;
  int lineno = 0, stmt_line = 1;
  while (std::getline(in, raw)) {
    ++lineno;
    // comments
    size_t c1 = raw.find('!');
    if (c1 != std::string::npos) raw = raw.substr(0, c1);
    size_t c2 = raw.find("//");
    if (c2 != std::string::npos) raw = raw.substr(0, c2);
    std::string line = strip(raw);
    if (line.empty()) continue;

    if (line.rfind("#SPECIES", 0) == 0 || line.rfind("#species", 0) == 0) {
      std::stringstream ss(line.substr(8));
      std::string sp;
      while (ss >> sp) {
        sp = lower(sp);
        if (sp_index.count(sp)) die("duplicate species '" + sp + "'", lineno);
        sp_index[sp] = int(species.size());
        species.push_back(sp);
      }
      continue;
    }

    if (pending.empty()) stmt_line = lineno;
    pending += " " + line;
    size_t semi;
    while ((semi = pending.find(';')) != std::string::npos) {
      std::string stmt = strip(pending.substr(0, semi));
      pending = pending.substr(semi + 1);
      if (stmt.empty()) continue;

      size_t colon = stmt.rfind(':');
      if (colon == std::string::npos) die("missing ': RATE' in '" + stmt + "'", stmt_line);
      size_t eq = stmt.find('=');
      if (eq == std::string::npos || eq > colon) die("missing '=' in '" + stmt + "'", stmt_line);

      Reaction rx;
      rx.rate = parse_rate(stmt.substr(colon + 1), stmt_line);

      for (std::string tok : split(stmt.substr(0, eq), '+')) {
        tok = lower(strip(tok));
        if (tok.empty()) continue;
        if (!sp_index.count(tok)) die("undeclared reactant '" + tok + "'", stmt_line);
        rx.reactants.push_back(tok);
      }
      if (rx.reactants.empty()) die("reaction with no reactants", stmt_line);
      if (rx.reactants.size() > 3) die("more than 3 reactants", stmt_line);

      for (std::string tok : split(stmt.substr(eq + 1, colon - eq - 1), '+')) {
        tok = strip(tok);
        if (tok.empty()) continue;
        // optional leading coefficient: '0.4 oh'
        double coef = 1.0;
        size_t sp_pos = 0;
        if (std::isdigit(static_cast<unsigned char>(tok[0])) || tok[0] == '.') {
          sp_pos = tok.find_first_of(" \t");
          if (sp_pos == std::string::npos)
            die("product coefficient without species in '" + tok + "'", stmt_line);
          coef = std::atof(tok.substr(0, sp_pos).c_str());
        }
        std::string sp = lower(strip(tok.substr(sp_pos)));
        if (!sp_index.count(sp)) die("undeclared product '" + sp + "'", stmt_line);
        rx.products.push_back({sp, coef});
      }
      reactions.push_back(std::move(rx));
    }
  }
  if (!strip(pending).empty()) die("trailing statement without ';'");
  if (species.empty()) die("no #SPECIES declaration");
  if (reactions.empty()) die("no reactions");

  std::ostream& o = std::cout;
  o << "{\n \"species\": [";
  for (size_t i = 0; i < species.size(); ++i) {
    if (i) o << ", ";
    json_escape(o, species[i]);
  }
  o << "],\n \"reactions\": [\n";
  for (size_t i = 0; i < reactions.size(); ++i) {
    const Reaction& r = reactions[i];
    o << "  {\"reactants\": [";
    for (size_t j = 0; j < r.reactants.size(); ++j) {
      if (j) o << ", ";
      json_escape(o, r.reactants[j]);
    }
    o << "], \"products\": [";
    for (size_t j = 0; j < r.products.size(); ++j) {
      if (j) o << ", ";
      o << "[";
      json_escape(o, r.products[j].sp);
      o << ", ";
      json_num(o, r.products[j].coef);
      o << "]";
    }
    o << "], \"rate\": [";
    if (r.rate.kind == "arr") {
      o << "\"arr\", ";
      json_num(o, r.rate.a); o << ", ";
      json_num(o, r.rate.n); o << ", ";
      json_num(o, r.rate.e_r);
    } else {
      o << "\"phot\", ";
      json_escape(o, r.rate.phot);
      o << ", ";
      json_num(o, r.rate.scale);
    }
    o << "]}" << (i + 1 < reactions.size() ? "," : "") << "\n";
  }
  o << " ]\n}\n";
  return 0;
}
