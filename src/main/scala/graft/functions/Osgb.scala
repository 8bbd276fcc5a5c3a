package graft.functions

/** EPSG:27700 (OSGB36 / British National Grid) → EPSG:4326 (WGS84).
  *
  * Same capability as the reference's osr.CoordinateTransformation
  * (src/process_cycle_networks.py:70-83,113-115), re-expressed as pure column
  * math from the published Ordnance Survey algorithm:
  *   1. inverse transverse Mercator on the Airy 1830 ellipsoid (iterated
  *      meridional arc, unrolled to 6 corrections — converges < 1e-12 rad);
  *   2. geodetic → cartesian on Airy;
  *   3. 7-parameter Helmert datum shift OSGB36→WGS84 (small-angle form);
  *   4. cartesian → geodetic on GRS80/WGS84 (4 fixed-point iterations).
  *
  * The WHOLE transform is ONE SQL string in a dialect subset shared by Spark
  * SQL and DuckDB (lateral column aliases + arithmetic + sin/cos/tan/atan2/
  * sqrt). Spark executes it via spark.sql over a temp view (fully Catalyst
  * codegen'd); the driver's oracle executes the identical text in DuckDB, so
  * both engines evaluate the same IEEE-754 expression DAG — no pow(), powers
  * are explicit multiplications to pin evaluation order.
  */
object Osgb {

  /** Shared SQL: expects a relation exposing (the key columns) + easting +
    * northing; emits lat/lon in degrees rounded to `digits`.
    */
  def reprojectSql(baseRelation: String, keyCols: Seq[String], digits: Int): String = {
    val bindings: Seq[(String, String)] = Seq(
      // Airy 1830 + BNG projection constants
      "lat0" -> "49*pi()/180",
      "lon0" -> "-2*pi()/180",
      "af0"  -> "6377563.396E0*0.9996012717E0",
      "bf0"  -> "6356256.909E0*0.9996012717E0",
      "e2"   -> "1 - (6356256.909E0*6356256.909E0)/(6377563.396E0*6377563.396E0)",
      "nsm"  -> "(6377563.396E0-6356256.909E0)/(6377563.396E0+6356256.909E0)",
      "dn"   -> "northing + 100000",  // N - N0, N0 = -100000
      // meridional-arc fixed point, 6 unrolled corrections
      "phi1" -> "dn/af0 + lat0",
      "m1"   -> marc("phi1"), "phi2" -> "(dn - m1)/af0 + phi1",
      "m2"   -> marc("phi2"), "phi3" -> "(dn - m2)/af0 + phi2",
      "m3"   -> marc("phi3"), "phi4" -> "(dn - m3)/af0 + phi3",
      "m4"   -> marc("phi4"), "phi5" -> "(dn - m4)/af0 + phi4",
      "m5"   -> marc("phi5"), "phi6" -> "(dn - m5)/af0 + phi5",
      "m6"   -> marc("phi6"), "phi7" -> "(dn - m6)/af0 + phi6",
      // TM inverse series
      "sp"   -> "sin(phi7)", "cp" -> "cos(phi7)", "tp" -> "tan(phi7)",
      "vv"   -> "1 - e2*sp*sp",
      "nu"   -> "af0/sqrt(vv)",
      "rho"  -> "af0*(1-e2)/(vv*sqrt(vv))",
      "eta2" -> "nu/rho - 1",
      "t2"   -> "tp*tp", "t4" -> "t2*t2", "t6" -> "t4*t2",
      "secp" -> "1/cp",
      "nu3"  -> "nu*nu*nu", "nu5" -> "nu3*nu*nu", "nu7" -> "nu5*nu*nu",
      "vii"  -> "tp/(2*rho*nu)",
      "viii" -> "tp/(24*rho*nu3)*(5 + 3*t2 + eta2 - 9*t2*eta2)",
      "ix"   -> "tp/(720*rho*nu5)*(61 + 90*t2 + 45*t4)",
      "xf"   -> "secp/nu",
      "xi"   -> "secp/(6*nu3)*(nu/rho + 2*t2)",
      "xii"  -> "secp/(120*nu5)*(5 + 28*t2 + 24*t4)",
      "xiia" -> "secp/(5040*nu7)*(61 + 662*t2 + 1320*t4 + 720*t6)",
      "de"   -> "easting - 400000",
      "de2"  -> "de*de", "de3" -> "de2*de", "de4" -> "de3*de",
      "de5"  -> "de4*de", "de6" -> "de5*de", "de7" -> "de6*de",
      "latos" -> "phi7 - vii*de2 + viii*de4 - ix*de6",
      "lonos" -> "lon0 + xf*de - xi*de3 + xii*de5 - xiia*de7",
      // geodetic → cartesian on Airy (h = 0)
      "sphi" -> "sin(latos)", "cphi" -> "cos(latos)",
      "slam" -> "sin(lonos)", "clam" -> "cos(lonos)",
      "nua"  -> "6377563.396E0/sqrt(1 - e2*sphi*sphi)",
      "x1"   -> "nua*cphi*clam", "y1" -> "nua*cphi*slam", "z1" -> "nua*(1-e2)*sphi",
      // Helmert OSGB36→WGS84 (inverse of the published WGS84→OSGB36 set)
      "rx"   -> "(0.1502E0/3600)*pi()/180",
      "ry"   -> "(0.2470E0/3600)*pi()/180",
      "rz"   -> "(0.8421E0/3600)*pi()/180",
      "sc"   -> "1 + (-20.4894E0/1000000)",
      "x2"   -> "446.448E0 + sc*x1 - rz*y1 + ry*z1",
      "y2"   -> "-125.157E0 + rz*x1 + sc*y1 - rx*z1",
      "z2"   -> "542.060E0 - ry*x1 + rx*y1 + sc*z1",
      // cartesian → geodetic on WGS84 (GRS80), 4 fixed-point iterations
      "e2w"  -> "1 - (6356752.3142E0*6356752.3142E0)/(6378137.0E0*6378137.0E0)",
      "pr"   -> "sqrt(x2*x2 + y2*y2)",
      "pw1"  -> "atan2(z2, pr*(1-e2w))",
      "pw2"  -> wgsIter("pw1"), "pw3" -> wgsIter("pw2"),
      "pw4"  -> wgsIter("pw3"), "pw5" -> wgsIter("pw4"),
      "latdeg" -> "pw5*180/pi()",
      "londeg" -> "atan2(y2, x2)*180/pi()"
    )
    val keys = keyCols.mkString(", ")
    // One binding per subquery layer. Lateral column aliases would be shorter,
    // but both DuckDB's binder and (for multiply-referenced aliases) Catalyst
    // inline them TEXTUALLY — the 6-deep fixed-point chain then explodes
    // exponentially. Layered projections keep the expression DAG linear.
    val body = bindings.foldLeft(s"SELECT $keys, easting, northing FROM $baseRelation") {
      case (acc, (n, e)) => s"SELECT *, $e AS $n FROM ($acc)"
    }
    s"""SELECT $keys, easting, northing,
       |  round(latdeg, $digits) AS lat, round(londeg, $digits) AS lon
       |FROM ($body) ORDER BY $keys""".stripMargin
  }

  /** Meridional arc M(phi) on Airy×F0 — OS series form. */
  private def marc(phi: String): String =
    s"bf0*((1 + nsm + 1.25E0*nsm*nsm + 1.25E0*nsm*nsm*nsm)*($phi - lat0)" +
      s" - (3*nsm + 3*nsm*nsm + 2.625E0*nsm*nsm*nsm)*sin($phi - lat0)*cos($phi + lat0)" +
      s" + (1.875E0*nsm*nsm + 1.875E0*nsm*nsm*nsm)*sin(2*($phi - lat0))*cos(2*($phi + lat0))" +
      s" - (35.0E0/24.0E0)*nsm*nsm*nsm*sin(3*($phi - lat0))*cos(3*($phi + lat0)))"

  private def wgsIter(prev: String): String =
    s"atan2(z2 + e2w*(6378137.0E0/sqrt(1 - e2w*sin($prev)*sin($prev)))*sin($prev), pr)"
}
