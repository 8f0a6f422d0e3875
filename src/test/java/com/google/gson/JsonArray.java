package com.google.gson;

import java.util.ArrayList;
import java.util.Iterator;
import java.util.List;
import java.util.StringJoiner;

public class JsonArray extends JsonElement implements Iterable<JsonElement> {
    private final List<JsonElement> elements = new ArrayList<>();

    public void add(JsonElement e) {
        elements.add(e);
    }

    @Override
    public Iterator<JsonElement> iterator() {
        return elements.iterator();
    }

    @Override
    public long getAsLong() {
        throw new UnsupportedOperationException();
    }

    @Override
    public String getAsString() {
        throw new UnsupportedOperationException();
    }

    @Override
    public String toString() {
        StringJoiner j = new StringJoiner(",", "[", "]");
        for (JsonElement e : elements) j.add(e.toString());
        return j.toString();
    }
}
