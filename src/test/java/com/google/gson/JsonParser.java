package com.google.gson;

/** Tiny recursive-descent JSON parser for the flat sidecar files the
 * reference reads ({"errors":[ts,...]}, {"rollup":300}). Test-scope stub.
 */
public class JsonParser {
    public JsonElement parse(String json) {
        P p = new P(json);
        JsonElement e = p.value();
        return e;
    }

    private static final class P {
        private final String s;
        private int i = 0;

        P(String s) {
            this.s = s;
        }

        private void ws() {
            while (i < s.length() && Character.isWhitespace(s.charAt(i))) i++;
        }

        JsonElement value() {
            ws();
            char c = s.charAt(i);
            if (c == '{') return object();
            if (c == '[') return array();
            if (c == '"') return new JsonPrimitive(string());
            if (c == 't') { i += 4; return new JsonPrimitive(Boolean.TRUE); }
            if (c == 'f') { i += 5; return new JsonPrimitive(Boolean.FALSE); }
            if (c == 'n') { i += 4; return new JsonPrimitive((String) null); }
            return number();
        }

        JsonObject object() {
            JsonObject o = new JsonObject();
            i++; // {
            ws();
            if (s.charAt(i) == '}') { i++; return o; }
            while (true) {
                ws();
                String k = string();
                ws();
                i++; // :
                o.add(k, value());
                ws();
                if (s.charAt(i) == ',') { i++; continue; }
                i++; // }
                return o;
            }
        }

        JsonArray array() {
            JsonArray a = new JsonArray();
            i++; // [
            ws();
            if (s.charAt(i) == ']') { i++; return a; }
            while (true) {
                a.add(value());
                ws();
                if (s.charAt(i) == ',') { i++; continue; }
                i++; // ]
                return a;
            }
        }

        String string() {
            StringBuilder b = new StringBuilder();
            i++; // "
            while (s.charAt(i) != '"') {
                char c = s.charAt(i);
                if (c == '\\') {
                    i++;
                    char e = s.charAt(i);
                    switch (e) {
                        case 'n': b.append('\n'); break;
                        case 't': b.append('\t'); break;
                        case 'r': b.append('\r'); break;
                        case 'u':
                            b.append((char) Integer.parseInt(s.substring(i + 1, i + 5), 16));
                            i += 4;
                            break;
                        default: b.append(e);
                    }
                } else {
                    b.append(c);
                }
                i++;
            }
            i++; // "
            return b.toString();
        }

        JsonPrimitive number() {
            int start = i;
            while (i < s.length() && "+-0123456789.eE".indexOf(s.charAt(i)) >= 0) i++;
            String n = s.substring(start, i);
            // reject malformed tokens at parse time (real gson validates the
            // token shape in JsonReader), but keep the VALUE lazy like
            // gson 2.3.1: the raw literal is stored and only coerced at
            // getAsLong/getAsString time, so an out-of-Long-range integer
            // parses fine and later WRAPS via BigDecimal.longValue()
            new java.math.BigDecimal(n); // shape check only
            return new JsonPrimitive(new LazilyParsedNumber(n));
        }
    }
}
