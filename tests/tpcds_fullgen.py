"""Deterministic full-schema TPC-DS micro-fixture for the VERBATIM query
texts (the tests/tpch_fullgen.py recipe applied to the reference's other
shipped corpus).

The reference ships all 99 TPC-DS query texts (cases/tpcds/query/) plus the
star-schema DDL (cases/tpcds/tpcds.sql) but cannot run them (no window
operator — pkg/plan/expr_properties.go:273). This module synthesizes every
table OF THAT DDL — schema parsed from the DDL file itself, so column names
and decimal precisions are the reference's own — with:

- spec value pools harvested from the 99 texts (categories, states, dem
  levels, manufact ids, price bands, month_seq/d_year windows ...), so the
  corpus' predicate literals all have live rows behind them;
- structural consistency the queries depend on: a real calendar with
  correct d_year/d_moy/d_dom/d_qoy/d_week_seq/d_month_seq arithmetic,
  returns that reference actual sales rows (item+ticket / order keys),
  ship dates after sold dates, tickets/orders as row groups with a single
  customer, multi-warehouse web orders (q94/q95), and planted item combos
  (q41);
- ~3-5% NULLs in nullable fact foreign keys (spec data has them; the
  null-channel accounting queries need them).

One deliberate schema delta, documented: the reference DDL predates the
query set and names the customer column ``c_last_review_date`` while
query30's text references ``c_last_review_date_sk`` (the TPC-DS v2.x
rename). The fixture carries BOTH columns with consistent values so the
text runs on Spark and DuckDB alike.

Everything is seeded (numpy default_rng(20260816)); regeneration is
byte-stable for a given numpy version.
"""

from __future__ import annotations

import datetime as dt
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DDL_PATH = "/root/reference/cases/tpcds/tpcds.sql"
SEED = 20260816

# ----------------------------------------------------------- schema (DDL)

def parse_ddl(path: str = DDL_PATH) -> dict[str, list[tuple[str, str]]]:
    """table -> [(column, ddl_type)] straight from the reference DDL."""
    text = open(path).read()
    out: dict[str, list[tuple[str, str]]] = {}
    for name, body in re.findall(
        r"create table if not exists (\w+)\s*\((.*?)\);", text, re.S
    ):
        cols = []
        for line in body.splitlines():
            line = line.strip().rstrip(",")
            if not line or line.startswith("primary key"):
                continue
            m = re.match(r"(\w+)\s+([\w()]+(?:\(\d+,\d+\))?)", line)
            if m:
                typ = re.match(r"(\w+(?:\(\d+(?:,\d+)?\))?)", line[m.start(2):]).group(1)
                cols.append((m.group(1), typ.lower()))
        out[name] = cols
    return out


def arrow_type(ddl_type: str) -> pa.DataType:
    if ddl_type == "integer":
        return pa.int32()
    if ddl_type == "date":
        return pa.date32()
    if ddl_type == "time":
        return pa.string()
    if ddl_type.startswith(("char", "varchar")):
        return pa.string()
    m = re.match(r"decimal\((\d+),(\d+)\)", ddl_type)
    if m:
        return pa.decimal128(int(m.group(1)), int(m.group(2)))
    raise ValueError(ddl_type)


# ------------------------------------------------------------ value pools
# harvested from the predicate literals of all 99 reference texts

CATEGORIES = ["Books", "Children", "Electronics", "Home", "Jewelry",
              "Men", "Music", "Shoes", "Sports", "Women"]
CLASSES = ["accessories", "audio", "classical", "country", "fragrances",
           "history", "pants", "personal", "portable", "reference",
           "school-uniforms", "self-help", "tennis", "womens"]
COLORS = ["aquamarine", "blush", "dark", "firebrick", "forest", "frosted",
          "lace", "lawn", "lime", "maroon", "misty", "navy", "orange",
          "orchid", "papaya", "peach", "pink", "plum", "powder",
          "seashell", "sienna", "sky", "slate", "smoke"]
SIZES = ["N/A", "economy", "extra large", "large", "petite", "small"]
UNITS = ["Box", "Bunch", "Bundle", "Carton", "Case", "Cup", "Dozen",
         "Dram", "Each", "Gross", "Lb", "Ounce", "Pallet", "Pound",
         "Tbl", "Ton"]
BRANDS = ["amalgimporto #1", "edu packscholar #1", "exportiimporto #1",
          "exportiunivamalg #9", "importoamalg #1",
          "scholaramalgamalg #14", "scholaramalgamalg #7",
          "scholaramalgamalg #9", "corpbrand #3", "univbrand #6"]
MANUFACT_IDS = list(range(700, 750)) + [259, 485, 559, 580, 816, 944]
EDUCATION = ["Primary", "Secondary", "College", "2 yr Degree",
             "4 yr Degree", "Advanced Degree", "Unknown"]
MARITAL = ["D", "M", "S", "U", "W"]
CREDIT = ["Good", "High Risk", "Low Risk", "Unknown"]
BUY_POTENTIAL = ["0-500", "501-1000", "1001-5000", "5001-10000",
                 ">10000", "Unknown"]
CA_STATES = ["AL", "AR", "CA", "CO", "GA", "IA", "ID", "IL", "IN", "KS",
             "KY", "MD", "ME", "MN", "MO", "MS", "MT", "NC", "ND", "NY",
             "OH", "OK", "PA", "SC", "SD", "TN", "TX", "VA", "WA", "WI",
             "WV", "WY"]
COUNTIES = ["Williamson County", "Campbell County", "Cleburne County",
            "Escambia County", "Fairfield County", "Washtenaw County",
            "Walker County", "Richland County", "Gaines County",
            "Fulton County", "Dona Ana County", "Daviess County",
            "Barrow County", "Franklin Parish", "Luce County",
            "Richland County", "Wadena County", "Pennington County",
            "Bronx County", "Mobile County", "Huron County",
            "Kittitas County", "Mesa County", "Oglethorpe County"]
CITIES = ["Woodland", "Fairview", "Midway", "Salem", "Oakland",
          "Georgetown", "Greenfield", "Centerville", "Oak Grove",
          "Riverside", "Union", "Wilson", "Glendale", "Liberty",
          "Lakewood", "Mount Olive", "Pleasant Hill", "Antioch",
          "Mount Zion", "Oakdale"]
# q8's zip list prefix sample + q45's — substr(ca_zip,1,5) membership
ZIPS = ["47602", "16704", "35863", "28577", "83910", "36201", "58412",
        "48162", "28055", "41419", "80332", "38607", "77817", "24891",
        "16226", "85669", "86197", "88274", "83405", "86475", "85392",
        "85460", "80348", "81792", "24128", "76232", "65084", "87816",
        "83926", "77556", "20548", "26231", "43848", "15126", "91137",
        "30625", "10644", "22470", "92745", "56458"]
FIRST_NAMES = ["James", "Mary", "John", "Patricia", "Robert", "Jennifer",
               "Michael", "Linda", "William", "Elizabeth", "David",
               "Barbara", "Richard", "Susan", "Joseph", "Jessica",
               "Thomas", "Sarah", "Charles", "Karen", "Daniel", "Nancy",
               "Matthew", "Lisa", "Anthony", "Betty", "Mark", "Margaret",
               "Donald", "Sandra"]
LAST_NAMES = ["Smith", "Johnson", "Williams", "Brown", "Jones", "Garcia",
              "Miller", "Davis", "Rodriguez", "Martinez", "Hernandez",
              "Lopez", "Gonzalez", "Wilson", "Anderson", "Thomas",
              "Taylor", "Moore", "Jackson", "Martin", "Lee", "Perez",
              "Thompson", "White", "Harris", "Sanchez", "Clark",
              "Ramirez", "Lewis", "Robinson"]
COUNTRIES = ["UNITED STATES", "CANADA", "MEXICO", "GERMANY", "FRANCE",
             "JAPAN", "BRAZIL", "INDIA"]
SM_TYPES = ["EXPRESS", "NEXT DAY", "OVERNIGHT", "REGULAR", "TWO DAY",
            "LIBRARY"]
SM_CARRIERS = ["ORIENTAL", "BOXBUNDLES", "UPS", "FEDEX", "AIRBORNE",
               "USPS", "DHL", "TBS", "ZHOU", "LATVIAN"]
SALUTATIONS = ["Mr.", "Mrs.", "Ms.", "Dr.", "Miss", "Sir"]
STORE_NAMES = ["ese", "ought", "able", "pri", "bar", "anti", "cally",
               "ation", "eing", "n st"]

# table sizes (facts sized so conjunctive spec predicates keep live rows)
N_ITEM = 320
N_CUSTOMER = 700
N_ADDRESS = 700
N_STORE = 12
N_WAREHOUSE = 6
N_PROMO = 40
N_REASON = 70
N_SHIP_MODE = 20
N_WEB_SITE = 8
N_WEB_PAGE = 20
N_CALL_CENTER = 6
N_CATALOG_PAGE = 60
N_SS_TICKETS = 7000
N_CS_ORDERS = 3200
N_WS_ORDERS = 2600

CAL_START = dt.date(1998, 1, 1)
CAL_END = dt.date(2003, 6, 30)
DATE_SK0 = 2450000  # arbitrary unique base; queries never use sk literals


# ------------------------------------------------------------- generators

class _Gen:
    def __init__(self):
        self.rng = np.random.default_rng(SEED)
        self.ddl = parse_ddl()
        self.n_days = (CAL_END - CAL_START).days + 1
        # sold-date sks stay ≥120 days inside the calendar so ship/return
        # date arithmetic (sold + up to 120) still lands on real days
        self.sellable_days = self.n_days - 130

    # -------------------------------------------------------- primitives
    def _money(self, n, lo, hi):
        return np.round(self.rng.uniform(lo, hi, n), 2)

    def _pick(self, pool, n, p=None):
        return self.rng.choice(np.asarray(pool, dtype=object), n, p=p)

    def _null_mask(self, n, frac):
        return self.rng.random(n) < frac

    # -------------------------------------------------------- dimensions
    def date_dim(self):
        days = [CAL_START + dt.timedelta(days=i) for i in range(self.n_days)]
        qname, mseq, wseq = [], [], []
        for d in days:
            q = (d.month - 1) // 3 + 1
            qname.append(f"{d.year}Q{q}")
            mseq.append((d.year - 1900) * 12 + d.month - 1)
            # consecutive week numbering anchored so week boundaries are
            # Mondays; absolute origin is arbitrary but shared by both
            # engines since it is DATA, not computation
            wseq.append((d.toordinal() - dt.date(1998, 1, 5).toordinal()) // 7 + 5270)
        dow = [(d.isoweekday() % 7) for d in days]  # 0=Sunday, per spec
        names = ["Sunday", "Monday", "Tuesday", "Wednesday", "Thursday",
                 "Friday", "Saturday"]
        return {
            "d_date_sk": np.arange(DATE_SK0, DATE_SK0 + self.n_days),
            "d_date_id": [f"DATE{i:012d}" for i in range(self.n_days)],
            "d_date": days,
            "d_month_seq": mseq,
            "d_week_seq": wseq,
            "d_quarter_seq": [(d.year - 1900) * 4 + (d.month - 1) // 3 for d in days],
            "d_year": [d.year for d in days],
            "d_dow": dow,
            "d_moy": [d.month for d in days],
            "d_dom": [d.day for d in days],
            "d_qoy": [(d.month - 1) // 3 + 1 for d in days],
            "d_fy_year": [d.year for d in days],
            "d_fy_quarter_seq": [(d.year - 1900) * 4 + (d.month - 1) // 3 for d in days],
            "d_fy_week_seq": wseq,
            "d_day_name": [names[w] for w in dow],
            "d_quarter_name": qname,
            "d_holiday": self._pick(["N", "Y"], self.n_days, p=[0.97, 0.03]),
            "d_weekend": ["Y" if w in (0, 6) else "N" for w in dow],
            "d_following_holiday": self._pick(["N", "Y"], self.n_days, p=[0.97, 0.03]),
            "d_first_dom": [DATE_SK0 + (d.replace(day=1) - CAL_START).days for d in days],
            "d_last_dom": [DATE_SK0 + (d.replace(day=28) - CAL_START).days for d in days],
            "d_same_day_ly": [DATE_SK0 + max(0, (d - CAL_START).days - 365) for d in days],
            "d_same_day_lq": [DATE_SK0 + max(0, (d - CAL_START).days - 91) for d in days],
            "d_current_day": ["N"] * self.n_days,
            "d_current_week": ["N"] * self.n_days,
            "d_current_month": ["N"] * self.n_days,
            "d_current_quarter": ["N"] * self.n_days,
            "d_current_year": ["N"] * self.n_days,
        }

    def time_dim(self):
        n = 1440  # per-minute; fact time sks sample these
        hours = np.arange(n) // 60
        minutes = np.arange(n) % 60
        meal = np.where(
            (hours >= 6) & (hours < 9), "breakfast",
            np.where((hours >= 11) & (hours < 13), "lunch",
                     np.where((hours >= 17) & (hours < 20), "dinner", None)),
        )
        return {
            "t_time_sk": np.arange(n),
            "t_time_id": [f"TIME{i:012d}" for i in range(n)],
            "t_time": hours * 3600 + minutes * 60,
            "t_hour": hours,
            "t_minute": minutes,
            "t_second": np.zeros(n, dtype=int),
            "t_am_pm": np.where(hours < 12, "AM", "PM"),
            "t_shift": np.where(hours < 8, "third",
                                np.where(hours < 16, "first", "second")),
            "t_sub_shift": np.where(hours < 6, "night",
                                    np.where(hours < 12, "morning",
                                             np.where(hours < 18, "afternoon", "evening"))),
            "t_meal_time": meal,
        }

    def item(self):
        n = N_ITEM
        rng = self.rng
        cat_id = rng.integers(1, 11, n)
        class_id = rng.integers(1, 15, n)
        mid = self._pick(MANUFACT_IDS, n).astype(object)
        price = np.round(rng.uniform(0.5, 99.0, n), 2)
        # guarantee the narrow price bands the texts probe stay populated
        price[0:8] = [0.99, 1.20, 1.49, 30.00, 50.00, 52.00, 62.00, 68.00]
        rows = {
            "i_item_sk": np.arange(1, n + 1),
            "i_item_id": [f"ITEM{i % (n - 20):011d}A" for i in range(n)],
            "i_rec_start_date": [dt.date(1997, 10, 27)] * n,
            "i_rec_end_date": [None] * n,
            "i_item_desc": [f"the description of item {i} for display" for i in range(n)],
            "i_current_price": price,
            "i_wholesale_cost": np.round(price * 0.6, 2),
            "i_brand_id": (cat_id * 1000000 + class_id * 1000 + rng.integers(1, 10, n)),
            "i_brand": self._pick(BRANDS, n),
            "i_class_id": class_id,
            "i_class": [CLASSES[c - 1] for c in class_id],
            "i_category_id": cat_id,
            "i_category": [CATEGORIES[c - 1] for c in cat_id],
            "i_manufact_id": mid,
            "i_manufact": [f"manufact_{int(m) % 37}" for m in mid],
            "i_size": self._pick(SIZES, n),
            "i_formulation": [f"form{i % 50:05d}" for i in range(n)],
            "i_color": self._pick(COLORS, n),
            "i_units": self._pick(UNITS, n),
            "i_container": ["Unknown"] * n,
            "i_manager_id": rng.integers(1, 101, n),
            "i_product_name": [f"product{i:08d}" for i in range(n)],
        }
        # q41 plant: the 8 (category, color, units, size) combos, each on
        # a manufact shared with the probe row, manufact_id in 704..744
        combos = [
            ("Women", "forest", "Pallet", "economy"),
            ("Women", "navy", "Gross", "extra large"),
            ("Men", "powder", "Dozen", "N/A"),
            ("Men", "maroon", "Ounce", "economy"),
            ("Women", "dark", "Ton", "economy"),
            ("Women", "frosted", "Dram", "extra large"),
            ("Men", "papaya", "Bundle", "N/A"),
            ("Men", "firebrick", "Cup", "economy"),
        ]
        for j, (cat, color, unit, size) in enumerate(combos):
            k = n - 16 + j  # plant rows at the tail
            rows["i_category"][k] = cat
            rows["i_category_id"][k] = CATEGORIES.index(cat) + 1
            rows["i_color"][k] = color
            rows["i_units"][k] = unit
            rows["i_size"][k] = size
            rows["i_manufact_id"][k] = 704 + j
            rows["i_manufact"][k] = f"manufact_q41_{j}"
            rows["i_manufact_id"][k - 8] = 704 + j  # probe sibling
            rows["i_manufact"][k - 8] = f"manufact_q41_{j}"
        return rows

    def customer_demographics(self):
        rows = []
        sk = 1
        for g in ["M", "F"]:
            for m in MARITAL:
                for e in EDUCATION:
                    for pe in [500, 1500, 5500, 9500]:
                        for cr in CREDIT:
                            rows.append((sk, g, m, e, pe, cr,
                                         sk % 7, sk % 5, sk % 4))
                            sk += 1
        a = list(zip(*rows))
        return {
            "cd_demo_sk": a[0], "cd_gender": a[1], "cd_marital_status": a[2],
            "cd_education_status": a[3], "cd_purchase_estimate": a[4],
            "cd_credit_rating": a[5], "cd_dep_count": a[6],
            "cd_dep_employed_count": a[7], "cd_dep_college_count": a[8],
        }

    def household_demographics(self):
        rows = []
        sk = 1
        for ib in range(1, 21):
            for bp in BUY_POTENTIAL:
                for dep in range(0, 10):
                    for veh in range(-1, 5):
                        rows.append((sk, ib, bp, dep, veh))
                        sk += 1
        a = list(zip(*rows))
        return {
            "hd_demo_sk": a[0], "hd_income_band_sk": a[1],
            "hd_buy_potential": a[2], "hd_dep_count": a[3],
            "hd_vehicle_count": a[4],
        }

    def income_band(self):
        return {
            "ib_income_band_sk": np.arange(1, 21),
            "ib_lower_bound": np.arange(0, 20) * 10000,
            "ib_upper_bound": np.arange(1, 21) * 10000 - 1,
        }

    def reason(self):
        return {
            "r_reason_sk": np.arange(1, N_REASON + 1),
            "r_reason_id": [f"RSN{i:013d}" for i in range(1, N_REASON + 1)],
            "r_reason_desc": [f"reason {i}" for i in range(1, N_REASON + 1)],
        }

    def ship_mode(self):
        n = N_SHIP_MODE
        return {
            "sm_ship_mode_sk": np.arange(1, n + 1),
            "sm_ship_mode_id": [f"SM{i:014d}" for i in range(1, n + 1)],
            "sm_type": [SM_TYPES[i % len(SM_TYPES)] for i in range(n)],
            "sm_code": self._pick(["AIR", "SURFACE", "SEA"], n),
            "sm_carrier": [SM_CARRIERS[i % len(SM_CARRIERS)] for i in range(n)],
            "sm_contract": [f"contract{i:05d}" for i in range(n)],
        }

    def customer_address(self):
        n = N_ADDRESS
        return {
            "ca_address_sk": np.arange(1, n + 1),
            "ca_address_id": [f"ADDR{i:012d}" for i in range(n)],
            "ca_street_number": [str(100 + i) for i in range(n)],
            "ca_street_name": [f"{LAST_NAMES[i % 30]} Street" for i in range(n)],
            "ca_street_type": self._pick(["Ave", "Blvd", "Ct", "Dr", "Ln", "St", "Way"], n),
            "ca_suite_number": [f"Suite {i % 90}" for i in range(n)],
            "ca_city": self._pick(CITIES, n),
            "ca_county": self._pick(COUNTIES, n),
            "ca_state": self._pick(CA_STATES, n),
            "ca_zip": self._pick(ZIPS, n),
            "ca_country": ["United States"] * n,
            "ca_gmt_offset": self._pick([-5.0, -6.0, -7.0, -8.0], n, p=[0.4, 0.3, 0.2, 0.1]),
            "ca_location_type": self._pick(["apartment", "condo", "single family"], n),
        }

    def customer(self):
        n = N_CUSTOMER
        rng = self.rng
        sold_sk_hi = DATE_SK0 + self.sellable_days
        first_sales = rng.integers(DATE_SK0, sold_sk_hi, n)
        review = rng.integers(DATE_SK0, DATE_SK0 + self.n_days - 1, n)
        return {
            "c_customer_sk": np.arange(1, n + 1),
            "c_customer_id": [f"CUST{i:012d}" for i in range(n)],
            "c_current_cdemo_sk": rng.integers(1, 1121, n),
            "c_current_hdemo_sk": rng.integers(1, 7201, n),
            "c_current_addr_sk": rng.integers(1, N_ADDRESS + 1, n),
            "c_first_shipto_date_sk": first_sales + rng.integers(0, 60, n),
            "c_first_sales_date_sk": first_sales,
            "c_salutation": self._pick(SALUTATIONS, n),
            "c_first_name": [FIRST_NAMES[i % 30] for i in range(n)],
            "c_last_name": [LAST_NAMES[(i * 7) % 30] for i in range(n)],
            "c_preferred_cust_flag": self._pick(["Y", "N"], n),
            "c_birth_day": rng.integers(1, 29, n),
            "c_birth_month": rng.integers(1, 13, n),
            "c_birth_year": rng.integers(1924, 1993, n),
            "c_birth_country": self._pick(COUNTRIES, n),
            "c_login": [None] * n,
            "c_email_address": [f"cust{i}@example.org" for i in range(n)],
            "c_last_review_date": [str(DATE_SK0 + int(v) % self.n_days) for v in review],
            # TPC-DS v2.x rename carried alongside the DDL's legacy column
            # so query30's text resolves (see module docstring)
            "c_last_review_date_sk": review,
        }

    def store(self):
        n = N_STORE
        rng = self.rng
        return {
            "s_store_sk": np.arange(1, n + 1),
            "s_store_id": [f"STORE{i:011d}" for i in range(n)],
            "s_rec_start_date": [dt.date(1997, 3, 13)] * n,
            "s_rec_end_date": [None] * n,
            "s_closed_date_sk": [None] * n,
            "s_store_name": [STORE_NAMES[i % len(STORE_NAMES)] for i in range(n)],
            "s_number_employees": rng.integers(180, 320, n),
            "s_floor_space": rng.integers(5000000, 9000000, n),
            "s_hours": self._pick(["8AM-8PM", "8AM-4PM", "8AM-12AM"], n),
            "s_manager": [f"{FIRST_NAMES[i % 30]} {LAST_NAMES[i % 30]}" for i in range(n)],
            "s_market_id": rng.integers(1, 11, n),
            "s_geography_class": ["Unknown"] * n,
            "s_market_desc": [f"market description {i}" for i in range(n)],
            "s_market_manager": [f"{FIRST_NAMES[(i + 3) % 30]} {LAST_NAMES[(i + 5) % 30]}" for i in range(n)],
            "s_division_id": [1] * n,
            "s_division_name": ["Unknown"] * n,
            "s_company_id": [1] * n,
            "s_company_name": ["Unknown"] * n,
            "s_street_number": [str(200 + i) for i in range(n)],
            "s_street_name": [f"{LAST_NAMES[(i + 11) % 30]} Blvd" for i in range(n)],
            "s_street_type": ["Blvd"] * n,
            "s_suite_number": [f"Suite {i}" for i in range(n)],
            "s_city": [(["Fairview"] * 5 + ["Midway"] * 4 + CITIES[3:6])[i] for i in range(n)],
            "s_county": ["Williamson County"] * n,
            "s_state": [(["TN"] * 8 + ["SD", "SD", "AL", "AL"])[i] for i in range(n)],
            "s_zip": self._pick(ZIPS, n),
            "s_country": ["United States"] * n,
            "s_gmt_offset": [(-5.0 if i % 3 else -7.0) for i in range(n)],
            "s_tax_precentage": [0.03] * n,
        }

    def warehouse(self):
        n = N_WAREHOUSE
        return {
            "w_warehouse_sk": np.arange(1, n + 1),
            "w_warehouse_id": [f"WH{i:014d}" for i in range(n)],
            "w_warehouse_name": [f"Warehouse number {i}" for i in range(n)],
            "w_warehouse_sq_ft": self.rng.integers(50000, 1000000, n),
            "w_street_number": [str(400 + i) for i in range(n)],
            "w_street_name": [f"{LAST_NAMES[(i + 2) % 30]} Rd" for i in range(n)],
            "w_street_type": ["Rd"] * n,
            "w_suite_number": [f"Suite {i}" for i in range(n)],
            "w_city": self._pick(CITIES, n),
            "w_county": ["Williamson County"] * n,
            "w_state": self._pick(["TN", "SD", "AL"], n),
            "w_zip": self._pick(ZIPS, n),
            "w_country": ["United States"] * n,
            "w_gmt_offset": self._pick([-5.0, -6.0], n),
        }

    def web_site(self):
        n = N_WEB_SITE
        return {
            "web_site_sk": np.arange(1, n + 1),
            "web_site_id": [f"WEB{i:013d}" for i in range(n)],
            "web_rec_start_date": [dt.date(1997, 8, 16)] * n,
            "web_rec_end_date": [None] * n,
            "web_name": [f"site_{i % 4}" for i in range(n)],
            "web_open_date_sk": [DATE_SK0 + 10] * n,
            "web_close_date_sk": [None] * n,
            "web_class": ["Unknown"] * n,
            "web_manager": [f"{FIRST_NAMES[i % 30]} {LAST_NAMES[(i + 9) % 30]}" for i in range(n)],
            "web_mkt_id": self.rng.integers(1, 7, n),
            "web_mkt_class": [f"mkt class {i}" for i in range(n)],
            "web_mkt_desc": [f"mkt description {i}" for i in range(n)],
            "web_market_manager": [f"{FIRST_NAMES[(i + 4) % 30]} {LAST_NAMES[(i + 13) % 30]}" for i in range(n)],
            "web_company_id": [(i % 3) + 1 for i in range(n)],
            "web_company_name": [["pri", "able", "ought"][i % 3] for i in range(n)],
            "web_street_number": [str(600 + i) for i in range(n)],
            "web_street_name": [f"{LAST_NAMES[(i + 17) % 30]} Ave" for i in range(n)],
            "web_street_type": ["Ave"] * n,
            "web_suite_number": [f"Suite {i}" for i in range(n)],
            "web_city": self._pick(CITIES, n),
            "web_county": ["Williamson County"] * n,
            "web_state": self._pick(["TN", "SD"], n),
            "web_zip": self._pick(ZIPS, n),
            "web_country": ["United States"] * n,
            "web_gmt_offset": [-5.0] * n,
            "web_tax_percentage": [0.02] * n,
        }

    def web_page(self):
        n = N_WEB_PAGE
        # q90's wp_char_count BETWEEN 5000 AND 5200 covers ~18% of the
        # 4500-5600 pool: with only 20 pages, an unlucky rng stream (the
        # stream SHIFTS with fact_scale) leaves the window empty and q90
        # divides by zero — pin the first pages into the window
        char_count = self.rng.integers(4500, 5600, n)
        char_count[:2] = (5100, 5150)
        return {
            "wp_web_page_sk": np.arange(1, n + 1),
            "wp_web_page_id": [f"WP{i:014d}" for i in range(n)],
            "wp_rec_start_date": [dt.date(1997, 9, 3)] * n,
            "wp_rec_end_date": [None] * n,
            "wp_creation_date_sk": [DATE_SK0 + 5] * n,
            "wp_access_date_sk": [DATE_SK0 + 400] * n,
            "wp_autogen_flag": self._pick(["Y", "N"], n),
            "wp_customer_sk": [None] * n,
            "wp_url": ["http://www.foo.com"] * n,
            "wp_type": self._pick(["order", "general", "welcome", "ad", "feedback"], n),
            "wp_char_count": char_count,
            "wp_link_count": self.rng.integers(2, 25, n),
            "wp_image_count": self.rng.integers(1, 7, n),
            "wp_max_ad_count": self.rng.integers(0, 4, n),
        }

    def call_center(self):
        n = N_CALL_CENTER
        return {
            "cc_call_center_sk": np.arange(1, n + 1),
            "cc_call_center_id": [f"CC{i:014d}" for i in range(n)],
            "cc_rec_start_date": [dt.date(1998, 1, 1)] * n,
            "cc_rec_end_date": [None] * n,
            "cc_closed_date_sk": [None] * n,
            "cc_open_date_sk": [DATE_SK0] * n,
            "cc_name": [f"call center {i}" for i in range(n)],
            "cc_class": self._pick(["small", "medium", "large"], n),
            "cc_employees": self.rng.integers(50, 700, n),
            "cc_sq_ft": self.rng.integers(5000, 50000, n),
            "cc_hours": self._pick(["8AM-8PM", "8AM-4PM"], n),
            "cc_manager": [f"{FIRST_NAMES[(i + 8) % 30]} {LAST_NAMES[(i + 21) % 30]}" for i in range(n)],
            "cc_mkt_id": self.rng.integers(1, 7, n),
            "cc_mkt_class": [f"mkt class {i}" for i in range(n)],
            "cc_mkt_desc": [f"mkt description {i}" for i in range(n)],
            "cc_market_manager": [f"{FIRST_NAMES[(i + 12) % 30]} {LAST_NAMES[(i + 3) % 30]}" for i in range(n)],
            "cc_division": [(i % 2) + 1 for i in range(n)],
            "cc_division_name": [["ought", "able"][i % 2] for i in range(n)],
            "cc_company": [(i % 3) + 1 for i in range(n)],
            "cc_company_name": [["pri", "able", "ought"][i % 3] for i in range(n)],
            "cc_street_number": [str(700 + i) for i in range(n)],
            "cc_street_name": [f"{LAST_NAMES[(i + 19) % 30]} Way" for i in range(n)],
            "cc_street_type": ["Way"] * n,
            "cc_suite_number": [f"Suite {i}" for i in range(n)],
            "cc_city": self._pick(CITIES, n),
            "cc_county": ["Williamson County"] * n,
            "cc_state": ["TN"] * n,
            "cc_zip": self._pick(ZIPS, n),
            "cc_country": ["United States"] * n,
            "cc_gmt_offset": [-5.0] * n,
            "cc_tax_percentage": [0.01] * n,
        }

    def catalog_page(self):
        n = N_CATALOG_PAGE
        return {
            "cp_catalog_page_sk": np.arange(1, n + 1),
            "cp_catalog_page_id": [f"CP{i:014d}" for i in range(n)],
            "cp_start_date_sk": [DATE_SK0] * n,
            "cp_end_date_sk": [DATE_SK0 + self.n_days - 1] * n,
            "cp_department": ["DEPARTMENT"] * n,
            "cp_catalog_number": [(i % 5) + 1 for i in range(n)],
            "cp_catalog_page_number": [i + 1 for i in range(n)],
            "cp_description": [f"catalog page description {i}" for i in range(n)],
            "cp_type": self._pick(["bi-annual", "quarterly", "monthly"], n),
        }

    def promotion(self):
        n = N_PROMO
        yn = lambda p: self._pick(["N", "Y"], n, p=[1 - p, p])
        return {
            "p_promo_sk": np.arange(1, n + 1),
            "p_promo_id": [f"PROMO{i:011d}" for i in range(n)],
            "p_start_date_sk": self.rng.integers(DATE_SK0, DATE_SK0 + 300, n),
            "p_end_date_sk": self.rng.integers(DATE_SK0 + 301, DATE_SK0 + self.n_days, n),
            "p_item_sk": self.rng.integers(1, N_ITEM + 1, n),
            "p_cost": [1000.0] * n,
            "p_response_target": [1] * n,
            "p_promo_name": self._pick(["anti", "ought", "able", "pri", "ese", "bar"], n),
            "p_channel_dmail": yn(0.5),
            "p_channel_email": yn(0.4),
            "p_channel_catalog": yn(0.4),
            "p_channel_tv": yn(0.4),
            "p_channel_radio": yn(0.4),
            "p_channel_press": yn(0.4),
            "p_channel_event": yn(0.5),
            "p_channel_demo": yn(0.4),
            "p_channel_details": [f"promo details {i}" for i in range(n)],
            "p_purpose": ["Unknown"] * n,
            "p_discount_active": yn(0.3),
        }

    def inventory(self):
        rng = self.rng
        # weekly snapshots: every 7th calendar day, 70 random items in 2
        # random warehouses each — q21/q37/q39/q72/q82 shapes
        weeks = np.arange(0, self.n_days, 7)
        recs = []
        for w in weeks:
            items = rng.choice(N_ITEM, 70, replace=False) + 1
            for it in items:
                for wh in rng.choice(N_WAREHOUSE, 2, replace=False) + 1:
                    recs.append((DATE_SK0 + int(w), int(it), int(wh)))
        n = len(recs)
        a = list(zip(*recs))
        qty = rng.integers(0, 620, n)
        return {
            "inv_date_sk": a[0], "inv_item_sk": a[1], "inv_warehouse_sk": a[2],
            "inv_quantity_on_hand": qty,
        }

    # -------------------------------------------------------------- facts
    def _ticket_rows(self, n_groups, mean_items):
        """Group sizes for tickets/orders: 1..(2*mean) uniform, plus a
        planted block of 15-20-item tickets (q34's band)."""
        sizes = self.rng.integers(1, 2 * mean_items, n_groups)
        sizes[:60] = self.rng.integers(15, 21, 60)  # q34/q23-style heavy tickets
        return sizes

    def store_sales(self):
        rng = self.rng
        sizes = self._ticket_rows(N_SS_TICKETS, 4)
        n = int(sizes.sum())
        ticket = np.repeat(np.arange(1, N_SS_TICKETS + 1), sizes)
        cust = np.repeat(rng.integers(1, N_CUSTOMER + 1, N_SS_TICKETS), sizes)
        store = np.repeat(rng.integers(1, N_STORE + 1, N_SS_TICKETS), sizes)
        sold = np.repeat(
            rng.integers(DATE_SK0, DATE_SK0 + self.sellable_days, N_SS_TICKETS), sizes
        )
        tim = np.repeat(rng.integers(0, 1440, N_SS_TICKETS), sizes)
        hdemo = np.repeat(rng.integers(1, 7201, N_SS_TICKETS), sizes)
        cdemo = np.repeat(rng.integers(1, 1121, N_SS_TICKETS), sizes)
        addr = np.repeat(rng.integers(1, N_ADDRESS + 1, N_SS_TICKETS), sizes)
        qty = rng.integers(1, 101, n)
        wcost = self._money(n, 20, 95)
        lprice = self._money(n, 10, 120)
        sprice = self._money(n, 0, 200)
        ext_sales = np.round(qty * sprice, 2)
        ext_list = np.round(qty * lprice, 2)
        ext_whole = np.round(qty * wcost, 2)
        disc = np.round(ext_list - ext_sales, 2).clip(0)
        coupon = np.where(rng.random(n) < 0.12,
                          self._money(n, 100, 11000), 0.0)
        net_paid = np.round(ext_sales - coupon, 2).clip(0)
        tax = np.round(net_paid * 0.05, 2)
        profit = np.round(net_paid - ext_whole, 2)
        # spec bands probed by q13/q48/q85 etc. need hits:
        # the uniform ranges above already cover them
        return {
            "ss_sold_date_sk": self._with_nulls(sold, 0.03),
            "ss_sold_time_sk": self._with_nulls(tim, 0.03),
            "ss_item_sk": rng.integers(1, N_ITEM + 1, n),
            "ss_customer_sk": self._with_nulls(cust, 0.03),
            "ss_cdemo_sk": self._with_nulls(cdemo, 0.03),
            "ss_hdemo_sk": self._with_nulls(hdemo, 0.03),
            "ss_addr_sk": self._with_nulls(addr, 0.03),
            "ss_store_sk": self._with_nulls(store, 0.03),
            "ss_promo_sk": self._with_nulls(rng.integers(1, N_PROMO + 1, n), 0.03),
            "ss_ticket_number": ticket,
            "ss_quantity": qty,
            "ss_wholesale_cost": wcost,
            "ss_list_price": lprice,
            "ss_sales_price": sprice,
            "ss_ext_discount_amt": disc,
            "ss_ext_sales_price": ext_sales,
            "ss_ext_wholesale_cost": ext_whole,
            "ss_ext_list_price": ext_list,
            "ss_ext_tax": tax,
            "ss_coupon_amt": coupon,
            "ss_net_paid": net_paid,
            "ss_net_paid_inc_tax": np.round(net_paid + tax, 2),
            "ss_net_profit": profit,
        }

    def _with_nulls(self, arr, frac):
        mask = self._null_mask(len(arr), frac)
        out = arr.astype(object)
        out[mask] = None
        return out

    def store_returns(self, ss):
        rng = self.rng
        n_ss = len(ss["ss_ticket_number"])
        idx = np.flatnonzero(rng.random(n_ss) < 0.30)
        n = len(idx)
        sold = np.array([v if v is not None else DATE_SK0 for v in ss["ss_sold_date_sk"]])[idx]
        ret_date = sold + rng.integers(1, 61, n)
        qty = np.minimum(np.asarray(ss["ss_quantity"])[idx],
                         rng.integers(1, 101, n))
        amt = np.round(qty * np.asarray(ss["ss_sales_price"])[idx], 2)
        fee = self._money(n, 0.5, 100)
        shipcost = self._money(n, 0, 500)
        refunded = np.round(amt * rng.uniform(0.3, 1.0, n), 2)
        reversed_ = np.round(amt - refunded, 2)
        tax = np.round(amt * 0.05, 2)
        return {
            "sr_returned_date_sk": self._with_nulls(ret_date, 0.03),
            "sr_return_time_sk": self._with_nulls(rng.integers(0, 1440, n), 0.03),
            "sr_item_sk": np.asarray(ss["ss_item_sk"])[idx],
            "sr_customer_sk": np.asarray(ss["ss_customer_sk"], dtype=object)[idx],
            "sr_cdemo_sk": np.asarray(ss["ss_cdemo_sk"], dtype=object)[idx],
            "sr_hdemo_sk": np.asarray(ss["ss_hdemo_sk"], dtype=object)[idx],
            "sr_addr_sk": np.asarray(ss["ss_addr_sk"], dtype=object)[idx],
            "sr_store_sk": np.asarray(ss["ss_store_sk"], dtype=object)[idx],
            "sr_reason_sk": self._with_nulls(rng.integers(1, N_REASON + 1, n), 0.02),
            "sr_ticket_number": np.asarray(ss["ss_ticket_number"])[idx],
            "sr_return_quantity": qty,
            "sr_return_amt": amt,
            "sr_return_tax": tax,
            "sr_return_amt_inc_tax": np.round(amt + tax, 2),
            "sr_fee": fee,
            "sr_return_ship_cost": shipcost,
            "sr_refunded_cash": refunded,
            "sr_reversed_charge": reversed_,
            "sr_store_credit": np.zeros(n),
            "sr_net_loss": np.round(fee + shipcost + tax, 2),
        }

    def catalog_sales(self):
        rng = self.rng
        sizes = rng.integers(1, 9, N_CS_ORDERS)
        n = int(sizes.sum())
        order = np.repeat(np.arange(1, N_CS_ORDERS + 1), sizes)
        cust = np.repeat(rng.integers(1, N_CUSTOMER + 1, N_CS_ORDERS), sizes)
        sold = np.repeat(
            rng.integers(DATE_SK0, DATE_SK0 + self.sellable_days, N_CS_ORDERS), sizes
        )
        ship_delta = rng.integers(1, 121, n)
        cdemo = np.repeat(rng.integers(1, 1121, N_CS_ORDERS), sizes)
        hdemo = np.repeat(rng.integers(1, 7201, N_CS_ORDERS), sizes)
        addr = np.repeat(rng.integers(1, N_ADDRESS + 1, N_CS_ORDERS), sizes)
        # ship-to mostly equals bill-to; ~10% gift orders differ (q10-ish)
        ship_cust = np.where(rng.random(n) < 0.9, cust,
                             rng.integers(1, N_CUSTOMER + 1, n))
        ship_addr = np.where(rng.random(n) < 0.9, addr,
                             rng.integers(1, N_ADDRESS + 1, n))
        qty = rng.integers(1, 101, n)
        wcost = self._money(n, 20, 95)
        lprice = self._money(n, 10, 120)
        sprice = self._money(n, 0, 300)
        ext_sales = np.round(qty * sprice, 2)
        ext_list = np.round(qty * lprice, 2)
        ext_whole = np.round(qty * wcost, 2)
        disc = np.round(ext_list - ext_sales, 2).clip(0)
        coupon = np.where(rng.random(n) < 0.10, self._money(n, 100, 11000), 0.0)
        net_paid = np.round(ext_sales - coupon, 2).clip(0)
        tax = np.round(net_paid * 0.05, 2)
        ship_cost = self._money(n, 0, 300)
        ext_ship = np.round(qty * ship_cost, 2)
        profit = np.round(net_paid - ext_whole, 2)
        return {
            "cs_sold_date_sk": self._with_nulls(sold, 0.03),
            "cs_sold_time_sk": self._with_nulls(rng.integers(0, 1440, n), 0.03),
            "cs_ship_date_sk": self._with_nulls(sold + ship_delta, 0.03),
            "cs_bill_customer_sk": self._with_nulls(cust, 0.03),
            "cs_bill_cdemo_sk": self._with_nulls(cdemo, 0.03),
            "cs_bill_hdemo_sk": self._with_nulls(hdemo, 0.03),
            "cs_bill_addr_sk": self._with_nulls(addr, 0.03),
            "cs_ship_customer_sk": self._with_nulls(ship_cust, 0.03),
            "cs_ship_cdemo_sk": self._with_nulls(cdemo, 0.03),
            "cs_ship_hdemo_sk": self._with_nulls(hdemo, 0.03),
            "cs_ship_addr_sk": self._with_nulls(ship_addr, 0.03),
            "cs_call_center_sk": self._with_nulls(rng.integers(1, N_CALL_CENTER + 1, n), 0.03),
            "cs_catalog_page_sk": self._with_nulls(rng.integers(1, N_CATALOG_PAGE + 1, n), 0.03),
            "cs_ship_mode_sk": self._with_nulls(rng.integers(1, N_SHIP_MODE + 1, n), 0.03),
            "cs_warehouse_sk": self._with_nulls(rng.integers(1, N_WAREHOUSE + 1, n), 0.03),
            "cs_item_sk": rng.integers(1, N_ITEM + 1, n),
            "cs_promo_sk": self._with_nulls(rng.integers(1, N_PROMO + 1, n), 0.03),
            "cs_order_number": order,
            "cs_quantity": qty,
            "cs_wholesale_cost": wcost,
            "cs_list_price": lprice,
            "cs_sales_price": sprice,
            "cs_ext_discount_amt": disc,
            "cs_ext_sales_price": ext_sales,
            "cs_ext_wholesale_cost": ext_whole,
            "cs_ext_list_price": ext_list,
            "cs_ext_tax": tax,
            "cs_coupon_amt": coupon,
            "cs_ext_ship_cost": ext_ship,
            "cs_net_paid": net_paid,
            "cs_net_paid_inc_tax": np.round(net_paid + tax, 2),
            "cs_net_paid_inc_ship": np.round(net_paid + ext_ship, 2),
            "cs_net_paid_inc_ship_tax": np.round(net_paid + ext_ship + tax, 2),
            "cs_net_profit": profit,
        }

    def catalog_returns(self, cs):
        rng = self.rng
        n_cs = len(cs["cs_order_number"])
        idx = np.flatnonzero(rng.random(n_cs) < 0.25)
        n = len(idx)
        sold = np.array([v if v is not None else DATE_SK0 for v in cs["cs_sold_date_sk"]])[idx]
        ret_date = sold + rng.integers(1, 61, n)
        qty = np.minimum(np.asarray(cs["cs_quantity"])[idx], rng.integers(1, 101, n))
        amt = np.round(qty * np.asarray(cs["cs_sales_price"])[idx], 2)
        fee = self._money(n, 0.5, 100)
        shipcost = self._money(n, 0, 500)
        refunded = np.round(amt * rng.uniform(0.3, 1.0, n), 2)
        tax = np.round(amt * 0.05, 2)
        return {
            "cr_returned_date_sk": ret_date,
            "cr_returned_time_sk": rng.integers(0, 1440, n),
            "cr_item_sk": np.asarray(cs["cs_item_sk"])[idx],
            "cr_refunded_customer_sk": np.asarray(cs["cs_bill_customer_sk"], dtype=object)[idx],
            "cr_refunded_cdemo_sk": np.asarray(cs["cs_bill_cdemo_sk"], dtype=object)[idx],
            "cr_refunded_hdemo_sk": np.asarray(cs["cs_bill_hdemo_sk"], dtype=object)[idx],
            "cr_refunded_addr_sk": np.asarray(cs["cs_bill_addr_sk"], dtype=object)[idx],
            "cr_returning_customer_sk": np.asarray(cs["cs_ship_customer_sk"], dtype=object)[idx],
            "cr_returning_cdemo_sk": np.asarray(cs["cs_ship_cdemo_sk"], dtype=object)[idx],
            "cr_returning_hdemo_sk": np.asarray(cs["cs_ship_hdemo_sk"], dtype=object)[idx],
            "cr_returning_addr_sk": np.asarray(cs["cs_ship_addr_sk"], dtype=object)[idx],
            "cr_call_center_sk": np.asarray(cs["cs_call_center_sk"], dtype=object)[idx],
            "cr_catalog_page_sk": np.asarray(cs["cs_catalog_page_sk"], dtype=object)[idx],
            "cr_ship_mode_sk": np.asarray(cs["cs_ship_mode_sk"], dtype=object)[idx],
            "cr_warehouse_sk": np.asarray(cs["cs_warehouse_sk"], dtype=object)[idx],
            "cr_reason_sk": self._with_nulls(rng.integers(1, N_REASON + 1, n), 0.02),
            "cr_order_number": np.asarray(cs["cs_order_number"])[idx],
            "cr_return_quantity": qty,
            "cr_return_amount": amt,
            "cr_return_tax": tax,
            "cr_return_amt_inc_tax": np.round(amt + tax, 2),
            "cr_fee": fee,
            "cr_return_ship_cost": shipcost,
            "cr_refunded_cash": refunded,
            "cr_reversed_charge": np.round(amt - refunded, 2),
            "cr_store_credit": np.zeros(n),
            "cr_net_loss": np.round(fee + shipcost + tax, 2),
        }

    def web_sales(self):
        rng = self.rng
        sizes = rng.integers(1, 9, N_WS_ORDERS)
        n = int(sizes.sum())
        order = np.repeat(np.arange(1, N_WS_ORDERS + 1), sizes)
        cust = np.repeat(rng.integers(1, N_CUSTOMER + 1, N_WS_ORDERS), sizes)
        sold = np.repeat(
            rng.integers(DATE_SK0, DATE_SK0 + self.sellable_days, N_WS_ORDERS), sizes
        )
        wh = np.repeat(rng.integers(1, N_WAREHOUSE + 1, N_WS_ORDERS), sizes).astype(object)
        # q94/q95 plant: the first 200 multi-row orders ship from TWO
        # warehouses (second line-item diverted to warehouse+1 mod N)
        multi = np.flatnonzero(sizes >= 2)[:200]
        starts = np.concatenate(([0], np.cumsum(sizes)[:-1]))
        for o in multi:
            r = starts[o] + 1
            wh[r] = (int(wh[r]) % N_WAREHOUSE) + 1
        ship_delta = rng.integers(1, 121, n)
        addr = np.repeat(rng.integers(1, N_ADDRESS + 1, N_WS_ORDERS), sizes)
        ship_cust = np.where(rng.random(n) < 0.9, cust,
                             rng.integers(1, N_CUSTOMER + 1, n))
        cdemo = np.repeat(rng.integers(1, 1121, N_WS_ORDERS), sizes)
        hdemo = np.repeat(rng.integers(1, 7201, N_WS_ORDERS), sizes)
        qty = rng.integers(1, 101, n)
        wcost = self._money(n, 20, 95)
        lprice = self._money(n, 10, 120)
        sprice = self._money(n, 0, 300)
        ext_sales = np.round(qty * sprice, 2)
        ext_list = np.round(qty * lprice, 2)
        ext_whole = np.round(qty * wcost, 2)
        disc = np.round(ext_list - ext_sales, 2).clip(0)
        coupon = np.where(rng.random(n) < 0.10, self._money(n, 100, 11000), 0.0)
        net_paid = np.round(ext_sales - coupon, 2).clip(0)
        tax = np.round(net_paid * 0.05, 2)
        ship_cost = self._money(n, 0, 300)
        ext_ship = np.round(qty * ship_cost, 2)
        profit = np.round(net_paid - ext_whole, 2)
        return {
            "ws_sold_date_sk": self._with_nulls(sold, 0.03),
            "ws_sold_time_sk": self._with_nulls(rng.integers(0, 1440, n), 0.03),
            "ws_ship_date_sk": self._with_nulls(sold + ship_delta, 0.03),
            "ws_item_sk": rng.integers(1, N_ITEM + 1, n),
            "ws_bill_customer_sk": self._with_nulls(cust, 0.03),
            "ws_bill_cdemo_sk": self._with_nulls(cdemo, 0.03),
            "ws_bill_hdemo_sk": self._with_nulls(hdemo, 0.03),
            "ws_bill_addr_sk": self._with_nulls(addr, 0.03),
            "ws_ship_customer_sk": self._with_nulls(ship_cust, 0.03),
            "ws_ship_cdemo_sk": self._with_nulls(cdemo, 0.03),
            "ws_ship_hdemo_sk": self._with_nulls(hdemo, 0.03),
            "ws_ship_addr_sk": self._with_nulls(addr, 0.03),
            "ws_web_page_sk": self._with_nulls(rng.integers(1, N_WEB_PAGE + 1, n), 0.03),
            "ws_web_site_sk": self._with_nulls(rng.integers(1, N_WEB_SITE + 1, n), 0.03),
            "ws_ship_mode_sk": self._with_nulls(rng.integers(1, N_SHIP_MODE + 1, n), 0.03),
            "ws_warehouse_sk": wh,
            "ws_promo_sk": self._with_nulls(rng.integers(1, N_PROMO + 1, n), 0.03),
            "ws_order_number": order,
            "ws_quantity": qty,
            "ws_wholesale_cost": wcost,
            "ws_list_price": lprice,
            "ws_sales_price": sprice,
            "ws_ext_discount_amt": disc,
            "ws_ext_sales_price": ext_sales,
            "ws_ext_wholesale_cost": ext_whole,
            "ws_ext_list_price": ext_list,
            "ws_ext_tax": tax,
            "ws_coupon_amt": coupon,
            "ws_ext_ship_cost": ext_ship,
            "ws_net_paid": net_paid,
            "ws_net_paid_inc_tax": np.round(net_paid + tax, 2),
            "ws_net_paid_inc_ship": np.round(net_paid + ext_ship, 2),
            "ws_net_paid_inc_ship_tax": np.round(net_paid + ext_ship + tax, 2),
            "ws_net_profit": profit,
        }

    def web_returns(self, ws):
        rng = self.rng
        n_ws = len(ws["ws_order_number"])
        idx = np.flatnonzero(rng.random(n_ws) < 0.25)
        n = len(idx)
        sold = np.array([v if v is not None else DATE_SK0 for v in ws["ws_sold_date_sk"]])[idx]
        ret_date = sold + rng.integers(1, 61, n)
        qty = np.minimum(np.asarray(ws["ws_quantity"])[idx], rng.integers(1, 101, n))
        amt = np.round(qty * np.asarray(ws["ws_sales_price"])[idx], 2)
        fee = self._money(n, 0.5, 100)
        shipcost = self._money(n, 0, 500)
        refunded = np.round(amt * rng.uniform(0.3, 1.0, n), 2)
        tax = np.round(amt * 0.05, 2)
        return {
            "wr_returned_date_sk": self._with_nulls(ret_date, 0.03),
            "wr_returned_time_sk": self._with_nulls(rng.integers(0, 1440, n), 0.03),
            "wr_item_sk": np.asarray(ws["ws_item_sk"])[idx],
            "wr_refunded_customer_sk": np.asarray(ws["ws_bill_customer_sk"], dtype=object)[idx],
            "wr_refunded_cdemo_sk": np.asarray(ws["ws_bill_cdemo_sk"], dtype=object)[idx],
            "wr_refunded_hdemo_sk": np.asarray(ws["ws_bill_hdemo_sk"], dtype=object)[idx],
            "wr_refunded_addr_sk": np.asarray(ws["ws_bill_addr_sk"], dtype=object)[idx],
            "wr_returning_customer_sk": np.asarray(ws["ws_ship_customer_sk"], dtype=object)[idx],
            "wr_returning_cdemo_sk": np.asarray(ws["ws_ship_cdemo_sk"], dtype=object)[idx],
            "wr_returning_hdemo_sk": np.asarray(ws["ws_ship_hdemo_sk"], dtype=object)[idx],
            "wr_returning_addr_sk": np.asarray(ws["ws_ship_addr_sk"], dtype=object)[idx],
            "wr_web_page_sk": np.asarray(ws["ws_web_page_sk"], dtype=object)[idx],
            "wr_reason_sk": self._with_nulls(rng.integers(1, N_REASON + 1, n), 0.02),
            "wr_order_number": np.asarray(ws["ws_order_number"])[idx],
            "wr_return_quantity": qty,
            "wr_return_amt": amt,
            "wr_return_tax": tax,
            "wr_return_amt_inc_tax": np.round(amt + tax, 2),
            "wr_fee": fee,
            "wr_return_ship_cost": shipcost,
            "wr_refunded_cash": refunded,
            "wr_reversed_charge": np.round(amt - refunded, 2),
            "wr_account_credit": np.zeros(n),
            "wr_net_loss": np.round(fee + shipcost + tax, 2),
        }

    # ------------------------------------------------------------- plants
    # Per-query non-vacuity plants (the tpch_fullgen discipline): a handful
    # of engineered rows per hard predicate-conjunction so every spec text
    # returns data on the micro-fixture. Random pools cover the single-
    # predicate queries; these cover the deep conjunctions / thresholds.

    def dsk(self, iso: str) -> int:
        return DATE_SK0 + (dt.date.fromisoformat(iso) - CAL_START).days

    @staticmethod
    def cd_sk(gender: str, marital: str, edu: str) -> int:
        """sk of the (gender, marital, edu) cell with pe/credit index 0 —
        inverse of the customer_demographics loop nest."""
        g = ["M", "F"].index(gender)
        m = MARITAL.index(marital)
        e = EDUCATION.index(edu)
        return ((g * 5 + m) * 7 + e) * 16 + 1

    @staticmethod
    def hd_sk(buy_potential: str, ib: int = 1, dep: int = 0, veh: int = -1) -> int:
        """Inverse of the household_demographics loop nest."""
        bp = BUY_POTENTIAL.index(buy_potential)
        return (((ib - 1) * 6 + bp) * 10 + dep) * 6 + (veh + 1) + 1

    @staticmethod
    def _as_lists(tbl: dict) -> None:
        for c in tbl:
            if not isinstance(tbl[c], list):
                tbl[c] = list(tbl[c])

    @staticmethod
    def _base_row(tbl: dict) -> dict:
        """Per-column default for appended rows: first non-null value (a
        null default in a key column would silently drop the plant from
        its join)."""
        base = {}
        for c, vals in tbl.items():
            base[c] = next((v for v in vals if v is not None), None)
        return base

    def _append(self, tbl: dict, rows: list[dict]) -> None:
        self._as_lists(tbl)
        base = self._base_row(tbl)
        for row in rows:
            for c in tbl:
                tbl[c].append(row.get(c, base[c]))

    def apply_plants(self, t: dict[str, dict]) -> None:
        for tbl in t.values():
            self._as_lists(tbl)
        item, store, ca, cust = t["item"], t["store"], t["customer_address"], t["customer"]
        ss, sr = t["store_sales"], t["store_returns"]
        cs, cr = t["catalog_sales"], t["catalog_returns"]
        ws, wr = t["web_sales"], t["web_returns"]
        inv = t["inventory"]

        # --- dim mutations (0-based index = sk-1) -----------------------
        # q64: item 6 in the color set at price 52 (both bands)
        item["i_color"][5] = "orange"
        item["i_current_price"][5] = 52.00
        # q24: colors probed by the two parts; store 5 zip-matched to the
        # address block; customers with non-US birth country
        item["i_color"][6] = "aquamarine"
        item["i_color"][7] = "seashell"
        store["s_market_id"][4] = 5
        store["s_zip"][4] = "47602"
        for i in range(89, 95):
            ca["ca_zip"][i] = "47602"
        for i, c in enumerate(range(79, 85)):
            cust["c_current_addr_sk"][c] = 90 + i
            cust["c_birth_country"][c] = "CANADA"
        # q54: Music/country item; TN/Williamson addresses matching stores
        item["i_category"][59] = "Music"
        item["i_category_id"][59] = CATEGORIES.index("Music") + 1
        item["i_class"][59] = "country"
        item["i_class_id"][59] = CLASSES.index("country") + 1
        for i in range(39, 46):
            ca["ca_county"][i] = "Williamson County"
            ca["ca_state"][i] = "TN"
        for c in range(39, 45):
            cust["c_current_addr_sk"][c] = c + 1
        # q30: an AR address block with customers living there
        for i in range(99, 106):
            ca["ca_state"][i] = "AR"
        for i, c in enumerate(range(89, 95)):
            cust["c_current_addr_sk"][c] = 100 + i
        # q91: callers in Dec 2000 with (M,Unknown)/(W,Adv Degree) demos,
        # 'Unknown' buy potential, gmt -7 addresses
        for i, c in enumerate(range(109, 115)):
            cust["c_current_cdemo_sk"][c] = (
                self.cd_sk("M", "M", "Unknown") if i % 2 == 0
                else self.cd_sk("F", "W", "Advanced Degree")
            )
            cust["c_current_hdemo_sk"][c] = self.hd_sk("Unknown")
            cust["c_current_addr_sk"][c] = 116 + i
            ca["ca_gmt_offset"][115 + i] = -7.0
        # q85: NC refund addresses (country already United States)
        ca["ca_state"][109] = "NC"

        # --- q21: inventory before/after band around 1999-06-22 ---------
        # items 1-3 hold the 0.99/1.20/1.49 price plants (item() head)
        inv_rows = []
        for it in (1, 2, 3):
            for off, qty in [(-28, 300), (-21, 300), (-14, 300), (-7, 300),
                             (0, 350), (7, 350), (14, 350), (21, 350)]:
                inv_rows.append({
                    "inv_date_sk": self.dsk("1999-06-22") + off,
                    "inv_item_sk": it, "inv_warehouse_sk": 1 + it % 2,
                    "inv_quantity_on_hand": qty,
                })
        # --- q39: (item, warehouse, month) cells with cov > 1.5 in BOTH
        # January and February 2000 (the text's d_year=2000, d_moy 1 -> 2;
        # [2,2,2,500] gives stddev_samp/mean ~ 1.97) ----------------------
        for it in range(21, 25):
            for wh in (1, 2):
                for month_start in ("2000-01-03", "2000-02-03"):
                    for off, qty in [(0, 2), (7, 2), (14, 2), (21, 500)]:
                        inv_rows.append({
                            "inv_date_sk": self.dsk(month_start) + off,
                            "inv_item_sk": it, "inv_warehouse_sk": wh,
                            "inv_quantity_on_hand": qty,
                        })
        self._append(inv, inv_rows)

        # --- q23 part 2: a frequent item + a runaway best customer ------
        ss_rows = []
        for k in range(6):  # item 50 sold 6x on one day -> count(*) > 4
            ss_rows.append({
                "ss_sold_date_sk": self.dsk("2000-07-05"),
                "ss_item_sk": 50, "ss_customer_sk": 100,
                "ss_ticket_number": 90000 + k, "ss_quantity": 2,
                "ss_sales_price": 30.00,
            })
        for k in range(25):  # customer 100 becomes the store-sales max
            ss_rows.append({
                "ss_sold_date_sk": self.dsk("2000-03-01") + 7 * k,
                "ss_item_sk": 50, "ss_customer_sk": 100,
                "ss_ticket_number": 90100 + k, "ss_quantity": 100,
                "ss_sales_price": 200.00,
            })
        cs_rows = [
            {"cs_sold_date_sk": self.dsk("2000-07-10"), "cs_item_sk": 50,
             "cs_bill_customer_sk": 100, "cs_order_number": 90000 + k,
             "cs_quantity": 5, "cs_list_price": 80.00} for k in range(2)
        ]
        ws_rows = [
            {"ws_sold_date_sk": self.dsk("2000-07-12"), "ws_item_sk": 50,
             "ws_bill_customer_sk": 100, "ws_order_number": 90000 + k,
             "ws_quantity": 5, "ws_list_price": 80.00} for k in range(2)
        ]

        # --- q58: items whose revenue in the week of 2001-06-16 is within
        # 0.9-1.1x of the 3-channel average in ALL channels: plant equal,
        # DOMINANT revenue (random base rows in that week then move the
        # ratios by <3%). Items 26/27 sit in the unique-i_item_id zone ----
        for it in (26, 27):
            for k in range(4):
                ss_rows.append({
                    "ss_sold_date_sk": self.dsk("2001-06-14"), "ss_item_sk": it,
                    "ss_ticket_number": 94000 + 10 * it + k,
                    "ss_quantity": 50, "ss_ext_sales_price": 50000.0,
                })
                cs_rows.append({
                    "cs_sold_date_sk": self.dsk("2001-06-14"), "cs_item_sk": it,
                    "cs_order_number": 94000 + 10 * it + k,
                    "cs_quantity": 50, "cs_ext_sales_price": 50000.0,
                })
                ws_rows.append({
                    "ws_sold_date_sk": self.dsk("2001-06-14"), "ws_item_sk": it,
                    "ws_order_number": 94000 + 10 * it + k,
                    "ws_quantity": 50, "ws_ext_sales_price": 50000.0,
                })

        # --- q54: Music/country buyers in Jan 1999, their store revenue
        # Feb-Apr 1999 (addresses co-located with stores) -----------------
        for i, c in enumerate(range(40, 46)):
            cs_rows.append({
                "cs_sold_date_sk": self.dsk("1999-01-15"), "cs_item_sk": 60,
                "cs_bill_customer_sk": c, "cs_order_number": 90100 + i,
                "cs_quantity": 3, "cs_list_price": 40.00,
            })
            for m, price in [("1999-02-10", 40.0), ("1999-03-10", 75.0)]:
                ss_rows.append({
                    "ss_sold_date_sk": self.dsk(m), "ss_item_sk": 60,
                    "ss_customer_sk": c, "ss_ticket_number": 91000 + 10 * i,
                    "ss_quantity": 2, "ss_sales_price": price,
                    "ss_ext_sales_price": round(2 * price, 2),
                })

        # --- q24 (both color parts): returned store purchases where the
        # store zip equals the customer's address zip --------------------
        sr_rows = []
        for i, c in enumerate(range(80, 86)):
            for j, it in enumerate((7, 8)):  # aquamarine, seashell
                tick = 92000 + 10 * i + j
                np_amt = 400.0 + 50 * i
                ss_rows.append({
                    "ss_sold_date_sk": self.dsk("2001-05-10"),
                    "ss_item_sk": it, "ss_customer_sk": c,
                    "ss_store_sk": 5, "ss_ticket_number": tick,
                    "ss_quantity": 4, "ss_sales_price": 100.0 + 10 * i,
                    "ss_net_paid": np_amt,
                })
                sr_rows.append({
                    "sr_returned_date_sk": self.dsk("2001-06-01"),
                    "sr_item_sk": it, "sr_customer_sk": c,
                    "sr_store_sk": 5, "sr_ticket_number": tick,
                    "sr_return_quantity": 1, "sr_return_amt": 50.0,
                })

        # --- q64: the full ss+sr+cs_ui chain on item 6, years 1999/2000,
        # one store, differing marital between sale-time and current cd ---
        cd_sale = self.cd_sk("M", "S", "College")
        for yr, day, k in [("1999-04-05", 0, 0), ("1999-04-05", 0, 1),
                           ("2000-04-05", 0, 2)]:
            tick = 93000 + (0 if k < 2 else 1)
            ss_rows.append({
                "ss_sold_date_sk": self.dsk(yr), "ss_item_sk": 6,
                "ss_customer_sk": 71, "ss_cdemo_sk": cd_sale,
                "ss_hdemo_sk": 1, "ss_addr_sk": 71, "ss_store_sk": 2,
                "ss_promo_sk": 1, "ss_ticket_number": tick,
                "ss_quantity": 2, "ss_wholesale_cost": 30.0,
                "ss_list_price": 60.0, "ss_coupon_amt": 0.0,
            })
            sr_rows.append({
                "sr_returned_date_sk": self.dsk(yr) + 20, "sr_item_sk": 6,
                "sr_customer_sk": 71, "sr_ticket_number": tick,
                "sr_return_quantity": 1, "sr_return_amt": 25.0,
            })
        # customer 71's CURRENT marital differs from the sale-time cd
        cust["c_current_cdemo_sk"][70] = self.cd_sk("M", "M", "College")
        cust["c_current_hdemo_sk"][70] = self.hd_sk("0-500", ib=2)
        # cs_ui's HAVING aggregates over ALL of item 6's matched cs/cr
        # pairs, including the random base ones whose refunds are sizeable;
        # two near-cap list-price pairs with token refunds dominate the sum
        cr_rows = []
        for k in range(2):
            cr_rows.append({
                "cr_returned_date_sk": self.dsk("1999-06-01"), "cr_item_sk": 6,
                "cr_order_number": 95000 + k, "cr_return_quantity": 1,
                "cr_refunded_cash": 10.0, "cr_reversed_charge": 5.0,
                "cr_store_credit": 0.0,
            })
            cs_rows.append({
                "cs_sold_date_sk": self.dsk("1999-05-01"), "cs_item_sk": 6,
                "cs_order_number": 95000 + k, "cs_quantity": 10,
                "cs_ext_list_price": 90000.0,
            })

        # --- q30: AR-resident returners in 2002, spread so some exceed
        # 1.2x the state average ------------------------------------------
        wr_rows = []
        for i, c in enumerate(range(90, 96)):
            wr_rows.append({
                "wr_returned_date_sk": self.dsk("2002-03-15") + i,
                "wr_item_sk": 10 + i, "wr_returning_customer_sk": c,
                "wr_returning_addr_sk": 100 + i, "wr_order_number": 96000 + i,
                "wr_return_quantity": 1, "wr_return_amt": 50.0 * (i + 1) ** 2,
            })

        # --- q83: the same items returned in all three channels within
        # the three probe weeks -------------------------------------------
        for it in range(13, 19):
            sr_rows.append({
                "sr_returned_date_sk": self.dsk("2001-07-13"), "sr_item_sk": it,
                "sr_ticket_number": 97000 + it, "sr_return_quantity": 3,
            })
            cr_rows.append({
                "cr_returned_date_sk": self.dsk("2001-09-10"), "cr_item_sk": it,
                "cr_order_number": 97000 + it, "cr_return_quantity": 2,
            })
            wr_rows.append({
                "wr_returned_date_sk": self.dsk("2001-11-16"), "wr_item_sk": it,
                "wr_order_number": 97000 + it, "wr_return_quantity": 4,
            })

        # --- q85: ws+wr pairs hitting the (marital, edu, price band) and
        # (state, profit band) conjunctions -------------------------------
        for i, (mar, edu, price) in enumerate([
            ("D", "Primary", 120.0), ("S", "College", 75.0),
            ("U", "Advanced Degree", 175.0),
        ]):
            cd = self.cd_sk("F", mar, edu)
            onum = 98000 + i
            ws_rows.append({
                "ws_sold_date_sk": self.dsk("1998-05-05"), "ws_item_sk": 30 + i,
                "ws_order_number": onum, "ws_web_page_sk": 2,
                "ws_quantity": 3, "ws_sales_price": price,
                "ws_net_profit": 150.0,
            })
            wr_rows.append({
                "wr_returned_date_sk": self.dsk("1998-06-01"),
                "wr_item_sk": 30 + i, "wr_order_number": onum,
                "wr_refunded_cdemo_sk": cd, "wr_returning_cdemo_sk": cd,
                "wr_refunded_addr_sk": 110, "wr_reason_sk": 3 + i,
                "wr_return_quantity": 1, "wr_refunded_cash": 40.0 + i,
                "wr_fee": 5.0 + i,
            })

        # --- q91: Dec-2000 catalog returns by the planted demographic ----
        for i, c in enumerate(range(110, 116)):
            cr_rows.append({
                "cr_returned_date_sk": self.dsk("2000-12-10") + i,
                "cr_item_sk": 40 + i, "cr_returning_customer_sk": c,
                "cr_call_center_sk": 1 + i % N_CALL_CENTER,
                "cr_order_number": 99000 + i, "cr_net_loss": 80.0 + 10 * i,
            })

        self._append(ss, ss_rows)
        self._append(sr, sr_rows)
        self._append(cs, cs_rows)
        self._append(cr, cr_rows)
        self._append(ws, ws_rows)
        self._append(wr, wr_rows)

    def dbgen_version(self):
        return {
            "dv_version": ["fixture-1.0"],
            "dv_create_date": [dt.date(2026, 8, 16)],
            "dv_create_time": ["00:00:00"],
            "dv_cmdline_args": ["tests/tpcds_fullgen.py"],
        }


# --------------------------------------------------------------- writing

def _to_table(rows: dict, schema_cols: list[tuple[str, str]]) -> pa.Table:
    arrays, names = [], []
    extra = {c: rows[c] for c in rows if c not in {c0 for c0, _ in schema_cols}}
    for col, typ in schema_cols:
        at = arrow_type(typ)
        vals = rows[col]
        if isinstance(vals, np.ndarray) and vals.dtype == object:
            vals = vals.tolist()
        elif isinstance(vals, np.ndarray):
            vals = vals.tolist()
        arr = pa.array(vals)
        if pa.types.is_decimal(at):
            # round-trip through a string cast would lose nothing but is
            # slow; float->decimal cast rounds to scale
            arr = arr.cast(pa.float64()).cast(at, safe=False)
        else:
            arr = arr.cast(at, safe=False)
        arrays.append(arr)
        names.append(col)
    for col, vals in extra.items():  # e.g. c_last_review_date_sk
        if isinstance(vals, np.ndarray):
            vals = vals.tolist()
        arrays.append(pa.array(vals).cast(pa.int32(), safe=False))
        names.append(col)
    return pa.Table.from_arrays(arrays, names=names)


def generate(outdir: str, fact_scale: int = 1) -> None:
    """``fact_scale`` multiplies the FACT table sizes (tickets/orders —
    store_sales rows ~= 28k x scale) while dimensions stay micro, so the
    per-query non-vacuity plants and the spec predicates' selectivity are
    untouched. scale=1 is the correctness fixture
    (tests/test_tpcds_verbatim.py); scale~20 is the sf0.1-equivalent
    star schema the bench-scale sweep times (r10 verdict #5:
    store_sales ~600k)."""
    global N_SS_TICKETS, N_CS_ORDERS, N_WS_ORDERS
    os.makedirs(outdir, exist_ok=True)
    saved = (N_SS_TICKETS, N_CS_ORDERS, N_WS_ORDERS)
    N_SS_TICKETS *= fact_scale
    N_CS_ORDERS *= fact_scale
    N_WS_ORDERS *= fact_scale
    try:
        _generate(outdir)
    finally:
        N_SS_TICKETS, N_CS_ORDERS, N_WS_ORDERS = saved


def _generate(outdir: str) -> None:
    g = _Gen()
    ss = g.store_sales()
    cs = g.catalog_sales()
    ws = g.web_sales()
    tables = {
        "date_dim": g.date_dim(),
        "time_dim": g.time_dim(),
        "item": g.item(),
        "customer": g.customer(),
        "customer_address": g.customer_address(),
        "customer_demographics": g.customer_demographics(),
        "household_demographics": g.household_demographics(),
        "income_band": g.income_band(),
        "reason": g.reason(),
        "ship_mode": g.ship_mode(),
        "store": g.store(),
        "warehouse": g.warehouse(),
        "web_site": g.web_site(),
        "web_page": g.web_page(),
        "call_center": g.call_center(),
        "catalog_page": g.catalog_page(),
        "promotion": g.promotion(),
        "inventory": g.inventory(),
        "store_sales": ss,
        "store_returns": g.store_returns(ss),
        "catalog_sales": cs,
        "catalog_returns": g.catalog_returns(cs),
        "web_sales": ws,
        "web_returns": g.web_returns(ws),
        "dbgen_version": g.dbgen_version(),
    }
    g.apply_plants(tables)
    ddl = g.ddl
    for name, rows in tables.items():
        pq.write_table(_to_table(rows, ddl[name]), os.path.join(outdir, f"{name}.parquet"))


if __name__ == "__main__":
    import sys

    generate(sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpcds_fixture")
